"""Sharded datagen fleet: determinism, assignment, idempotency, merge."""

import json
import os

import pytest

from pdec.pipeline.datagen_fleet import (
    FAMILY_MIX,
    generate_shard,
    host_shards,
    merge_shards,
    run_shard,
    shard_spec,
)


def test_shard_spec_partitions_total():
    total, n_shards = 1003, 7
    sizes = [shard_spec(total, n_shards, s) for s in range(n_shards)]
    assert sum(sizes) == total
    assert max(sizes) - min(sizes) <= 1


def test_generate_shard_deterministic_and_host_independent():
    a = generate_shard(3, 8, 4000, seed=11)
    b = generate_shard(3, 8, 4000, seed=11)
    assert a == b  # bit-for-bit reproducible on any host
    c = generate_shard(4, 8, 4000, seed=11)
    assert a[0] != c[0]  # different shards differ


def test_generate_shard_follows_family_mix():
    rows = generate_shard(0, 1, 3000, seed=0)
    counts = {}
    for r in rows:
        counts[r["dataset_class"]] = counts.get(r["dataset_class"], 0) + 1
    for kind, nc, weight in FAMILY_MIX:
        got = counts.get(f"{kind}_nc{nc}", 0) / len(rows)
        assert abs(got - weight) < 0.05, (kind, nc, got, weight)


def test_host_assignment_disjoint_and_complete():
    n_shards, n_hosts = 23, 4
    all_shards = []
    for h in range(n_hosts):
        all_shards.extend(host_shards(n_shards, h, n_hosts))
    assert sorted(all_shards) == list(range(n_shards))


def test_run_shard_idempotent_and_merge(tmp_path):
    out = str(tmp_path)
    for s in range(3):
        m = run_shard(s, 3, 60, out, seed=5, label=False, log=lambda _: None)
        assert m["n_samples"] == 20
    # idempotency: second run skips (file mtimes unchanged)
    p = os.path.join(out, "shard_00001.jsonl")
    mtime = os.path.getmtime(p)
    run_shard(1, 3, 60, out, seed=5, label=False, log=lambda _: None)
    assert os.path.getmtime(p) == mtime

    stats = merge_shards(out)
    assert stats["n_samples"] == 60
    assert stats["n_shards"] == 3
    merged = os.path.join(out, "corpus.jsonl")
    rows = [json.loads(l) for l in open(merged) if l.strip()]
    assert len(rows) == 60
    assert all({"nl", "sstl", "python"} <= set(r) for r in rows)


@pytest.mark.slow
def test_run_shard_with_labeling(tmp_path):
    """End-to-end shard incl. batched GT labeling (small, CPU)."""
    m = run_shard(0, 1, 8, str(tmp_path), seed=2, label=True,
                  log=lambda _: None)
    assert m["n_samples"] == 8
    assert 0.0 <= m["gt positive robustness rate"] <= 1.0
    rows = [json.loads(l)
            for l in open(os.path.join(str(tmp_path), "shard_00000.jsonl"))]
    assert all("robustness" in r and "time" in r for r in rows)


@pytest.mark.slow
def test_run_shard_relabels_existing_unlabeled(tmp_path):
    """A shard generated without --label is regenerated WITH labels when
    labeling is requested later (in-place corpus labeling resume), while a
    second labeled pass still skips."""
    out = str(tmp_path)
    run_shard(0, 1, 8, out, seed=2, label=False, log=lambda _: None)
    p = os.path.join(out, "shard_00000.jsonl")
    rows = [json.loads(l) for l in open(p)]
    assert all("robustness" not in r for r in rows)

    m = run_shard(0, 1, 8, out, seed=2, label=True, log=lambda _: None)
    assert "label_seconds" in m
    rows = [json.loads(l) for l in open(p)]
    assert all("robustness" in r for r in rows)

    mtime = os.path.getmtime(p)
    run_shard(0, 1, 8, out, seed=2, label=True, log=lambda _: None)
    assert os.path.getmtime(p) == mtime  # labeled shard: skipped


def test_cli_explicit_shard_selection(tmp_path):
    """--shards 'a-b,c' overrides host assignment (used to GT-label a
    defined slice of a big corpus before generating the rest)."""
    from pdec.cli.datagen import main as datagen_main

    out = str(tmp_path / "c")
    datagen_main(["--out-dir", out, "--total", "64", "--n-shards", "8",
                  "--shards", "0-1,5"])
    import os
    have = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert have == ["shard_00000.jsonl", "shard_00001.jsonl",
                    "shard_00005.jsonl"]
