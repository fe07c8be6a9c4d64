"""Results aggregation CLI (reference ``test/scripts/read_result.py``).

    python -m pdec.cli.aggregate --in-dir runs/eval [--methods ...]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--methods", nargs="+", default=None)
    args = p.parse_args(argv)

    from pdec.pipeline.aggregate import write_reports

    paths = write_reports(args.in_dir, args.out_dir, args.methods)
    for path in paths:
        print(path)
        with open(path) as f:
            print(f.read())


if __name__ == "__main__":
    main()
