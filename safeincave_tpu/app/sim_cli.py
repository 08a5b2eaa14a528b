"""Headless CLI: run a JSON-configured simulation.

Reference: /root/reference/safeincave/app/sim_cli.py
(``python -m safeincave.app.sim_cli --json file``).

Usage:  python -m safeincave_tpu.app.sim_cli --json input_file.json
"""
import argparse

from ..config import run_from_json


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Run a safeincave-tpu simulation from a JSON input file.")
    parser.add_argument("--json", required=True,
                        help="path to the input_file.json")
    args = parser.parse_args(argv)
    run_from_json(args.json)


if __name__ == "__main__":
    main()
