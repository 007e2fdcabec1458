"""smc++ simulate: simulate data under a fitted model with msprime."""

import json
import logging
import sys

from ..models import model_from_dict
from . import command

logger = logging.getLogger(__name__)


class Simulate(command.Command, command.ConsoleCommand):
    "Simulate from a fitted model (requires msprime)"

    def __init__(self, parser):
        command.Command.__init__(self, parser)
        parser.add_argument("model", metavar="model.final.json")
        parser.add_argument("n", type=int, help="diploid sample size")
        parser.add_argument("length", type=float, help="sequence length")
        parser.add_argument("output", metavar="output.vcf[.gz]")
        parser.add_argument("--contig-id", default="1")
        parser.add_argument("-r", type=float, default=1e-8,
                            help="recombination rate")
        parser.add_argument("-u", type=float, default=1.25e-8,
                            help="mutation rate")

    def main(self, args):
        command.Command.main(self, args)
        try:
            import msprime as msp
        except ImportError:
            sys.exit("simulate requires msprime, which is not installed")
        j = json.load(open(args.model))
        m = model_from_dict(j["model"])
        events = m.to_msp()
        npop = getattr(m, "NPOP", 1)
        pop_configs = [
            msp.PopulationConfiguration(sample_size=2 * args.n)
            for _ in range(npop)
        ]
        ts = msp.simulate(
            population_configurations=pop_configs,
            demographic_events=events,
            length=args.length,
            recombination_rate=args.r,
            mutation_rate=args.u,
        )
        opener = __import__("gzip").open if args.output.endswith(".gz") else open
        with opener(args.output, "wt") as f:
            ts.write_vcf(f, ploidy=2, contig_id=args.contig_id)
