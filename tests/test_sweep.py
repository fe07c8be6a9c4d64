"""Sweep orchestration: per-combo fault isolation."""
import json
import os

from pdec.pipeline.sweep import run_sweep


class _StubResult:
    def __init__(self, metrics):
        self.metrics = metrics


class _FlakyDriver:
    def __init__(self):
        self.calls = []

    def run(self, items, eval_method, shots, seed, dataset_name,
            out_dir, skip_existing_scores):
        self.calls.append((dataset_name, eval_method, shots))
        if eval_method == "bad" and shots == 0:
            raise RuntimeError("transient tunnel failure")
        return _StubResult({"n_samples": len(items)})


def test_run_sweep_survives_combo_failure(tmp_path):
    ds = tmp_path / "a.jsonl"
    ds.write_text(json.dumps({"nl": "x"}) + "\n")
    driver = _FlakyDriver()
    results, failed = run_sweep(
        driver, {"a": str(ds)}, ["bad", "good"], shots_list=(0, 2),
        out_dir=str(tmp_path / "out"),
    )
    # the failing combo is skipped, every other combo still runs — and the
    # failure is REPORTED so callers can exit nonzero (orchestration
    # fallbacks key on the exit code)
    assert len(driver.calls) == 4
    assert ("a", "bad", 0) not in results
    assert results[("a", "good", 0)] == {"n_samples": 1}
    assert results[("a", "bad", 2)] == {"n_samples": 1}
    assert failed == [("a", "bad", 0)]
