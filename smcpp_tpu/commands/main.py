"""Console entry point: subcommand registry (mirrors smcpp/frontend/console.py)."""

import argparse
import sys


def main(argv=None):
    from . import (  # noqa: F401
        chunk, cite, cv, estimate, plot, posterior, simulate, split,
        vcf2smc, version,
    )
    from .command import ConsoleCommand

    parser = argparse.ArgumentParser(prog="smc++")
    subparsers = parser.add_subparsers(dest="command", required=True)
    cmds = {}
    for cls in ConsoleCommand.__subclasses__():
        name = cls.__name__.lower()
        p = subparsers.add_parser(name, help=(cls.__doc__ or "").strip())
        cmds[name] = cls(p)
    args = parser.parse_args(argv)
    cmds[args.command].main(args)


if __name__ == "__main__":
    main()
