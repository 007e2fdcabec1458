"""smc++ plot: plot fitted size histories from model JSON files."""

import json
import logging

import numpy as np

from .. import plotting
from . import command

logger = logging.getLogger(__name__)


class Plot(command.Command, command.ConsoleCommand):
    "Plot size history from fitted model(s)"

    def __init__(self, parser):
        command.Command.__init__(self, parser)
        parser.add_argument("-g", type=float,
                            help="years per generation (x axis in years)")
        parser.add_argument("--logy", action="store_true",
                            help="log-scale y axis")
        parser.add_argument("-c", "--csv", action="store_true",
                            help="also write a CSV of the plotted values")
        parser.add_argument("-x", "--xlim", type=float, nargs=2, default=None)
        parser.add_argument("-y", "--ylim", type=float, nargs=2, default=None)
        parser.add_argument("-k", "--knots", action="store_true",
                            help="also plot the spline knots")
        parser.add_argument("pdf", metavar="plot.(pdf|png|jpeg)")
        parser.add_argument("model", nargs="+", metavar="model.final.json")

    def main(self, args):
        command.Command.main(self, args)
        psfs = []
        for fn in args.model:
            d = json.load(open(fn))
            for label, series in plotting.model_to_plot_dict(d):
                series["g"] = args.g
                psfs.append((label or fn, series))
        xlabel = "Years" if args.g else "Generations"
        fig, data = plotting.plot_psfs(
            psfs, args.xlim, args.ylim, xlabel,
            knots=args.knots, logy=args.logy,
        )
        fig.savefig(args.pdf)
        if args.csv:
            import csv

            base = args.pdf.rsplit(".", 1)[0]
            with open(base + ".csv", "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["label", "x", "y", "plot_type", "plot_num"])
                for row in data[1:]:
                    label, x, y, pt, pn = row
                    for xx, yy in zip(x, y):
                        w.writerow([label, xx, yy, pt, pn])
