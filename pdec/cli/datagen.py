"""Corpus generation CLI: sample problems, render triplets, label with
batched TPU synthesis.

Replaces the reference's unshipped generator + ``simulate_gt.py``
(one-Gurobi-call-at-a-time labeling, 300 s/example budget) with
whole-batch synthesis labeling.

Single-file mode:
    python -m pdec.cli.datagen --kind heat --nc 1 --n 512 \\
        --out datasets/heat_nc1.jsonl --label

Fleet (multi-host) mode — shards are deterministic in (seed, shard_id) and
idempotent on disk, so a 2M-sample pod run is this same command on every
host (see `pdec.pipeline.datagen_fleet`):
    python -m pdec.cli.datagen --total 2000000 --n-shards 256 \\
        --host-id $I --n-hosts $N --out-dir corpus/ --label
    python -m pdec.cli.datagen --out-dir corpus/ --merge
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["heat", "wave"], default="heat")
    p.add_argument("--nc", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--label", action="store_true",
                   help="label with GT robustness via batched synthesis")
    p.add_argument("--batch", type=int, default=1024,
                   help="synthesis batch size per device dispatch")
    p.add_argument("--no-disjunction", action="store_true")
    # fleet mode
    p.add_argument("--out-dir", default=None,
                   help="fleet mode: shard output directory")
    p.add_argument("--total", type=int, default=None,
                   help="fleet mode: total corpus rows across all shards")
    p.add_argument("--n-shards", type=int, default=None,
                   help="fleet mode: shard count (default: 1 per 8192 rows)")
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--n-hosts", type=int, default=1)
    p.add_argument("--high-quality", action="store_true",
                   help="SynthesisConfig.high() labeling")
    p.add_argument("--merge", action="store_true",
                   help="fleet mode: merge completed shards + stats")
    p.add_argument("--shards", default=None,
                   help="fleet mode: explicit shard range 'a-b' (inclusive) "
                        "or comma list, overriding host assignment — e.g. "
                        "label a defined slice with --shards 0-12 --label, "
                        "then generate the rest unlabeled (existing shards "
                        "are skipped)")
    args = p.parse_args(argv)

    if args.out_dir is not None:
        return _fleet_main(args)
    if args.out is None:
        p.error("--out is required (or --out-dir for fleet mode)")

    from pdec.data.generator import GeneratorConfig, render_example, sample_problem

    rng = random.Random(args.seed)
    cfg = GeneratorConfig(
        kind=args.kind, n_clauses=args.nc,
        allow_disjunction=not args.no_disjunction,
    )
    rows = []
    t0 = time.time()
    for _ in range(args.n):
        rows.append(render_example(sample_problem(rng, cfg)))
    print(f"generated {len(rows)} examples in {time.time()-t0:.1f}s",
          file=sys.stderr)

    if args.label:
        from pdec.pipeline.simulate import simulate_ground_truth

        labeled = []
        t0 = time.time()
        for i in range(0, len(rows), args.batch):
            chunk, _ = simulate_ground_truth(rows[i : i + args.batch])
            labeled.extend(chunk)
            done = len(labeled)
            rate = done / (time.time() - t0)
            print(f"labeled {done}/{len(rows)} ({rate:.1f} solves/s)",
                  file=sys.stderr)
        rows = labeled

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)



def _fleet_main(args):
    from pdec.pipeline.datagen_fleet import (
        host_shards, merge_shards, run_shard,
    )

    if args.merge:
        stats = merge_shards(args.out_dir)
        print(json.dumps(stats, indent=2))
        return

    if args.total is None:
        raise SystemExit("--total is required in fleet mode")
    n_shards = args.n_shards or max(1, (args.total + 8191) // 8192)
    if args.shards:
        mine = []
        for part in args.shards.split(","):
            if "-" in part:
                a, b = part.split("-")
                mine.extend(range(int(a), int(b) + 1))
            else:
                mine.append(int(part))
        mine = [s for s in mine if 0 <= s < n_shards]
    else:
        mine = host_shards(n_shards, args.host_id, args.n_hosts)
    print(f"host {args.host_id}/{args.n_hosts}: shards {mine}",
          file=sys.stderr)
    t0 = time.time()
    done = 0
    for shard_id in mine:
        run_shard(
            shard_id, n_shards, args.total, args.out_dir, seed=args.seed,
            label=args.label, batch=args.batch,
            high_quality=args.high_quality,
            log=lambda m: print(m, file=sys.stderr),
        )
        done += 1
        rate = done / max(time.time() - t0, 1e-9)
        eta = (len(mine) - done) / max(rate, 1e-9)
        print(f"host {args.host_id}: {done}/{len(mine)} shards, "
              f"ETA {eta/60:.1f} min", file=sys.stderr)


if __name__ == "__main__":
    main()
