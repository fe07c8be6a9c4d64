"""End-to-end pipeline tests: eval driver, GT simulation, aggregation.

Uses the TINY model with a byte tokenizer — generations are gibberish, so
these tests exercise plumbing, output layout, failure accounting, and the
metric schema (the reference's smoke-scale strategy: ``max_samples=4``,
``test_pdecontrol.sh:36``).
"""

import json
import os
import random

import jax
import pytest

from pdec.control.synthesis import SynthesisConfig
from pdec.data.generator import GeneratorConfig, render_example, sample_problem
from pdec.infer.engine import InferenceEngine
from pdec.models.config import TINY
from pdec.models.transformer import init_params
from pdec.pipeline.aggregate import aggregate_results, format_markdown_table, write_reports
from pdec.pipeline.evaluate import EvalDriver
from pdec.pipeline.simulate import simulate_ground_truth

from tests.test_infer import ByteTokenizer

FAST_SYNTH = SynthesisConfig(n_iters=6, n_starts=2)


@pytest.fixture(scope="module")
def items():
    rng = random.Random(7)
    return [
        render_example(sample_problem(rng, GeneratorConfig(kind="heat", n_clauses=1)))
        for _ in range(3)
    ]


@pytest.fixture(scope="module")
def driver():
    params = init_params(jax.random.PRNGKey(0), TINY)
    engine = InferenceEngine(params, TINY, ByteTokenizer(), max_len=512)
    engines = {"translator": engine, "coder": engine, "controller": engine}
    return EvalDriver(
        engines, synthesis=FAST_SYNTH, max_new_tokens=8, temperature=0.0,
    )


def test_eval_driver_layout_and_schema(driver, items, tmp_path):
    res = driver.run(
        items, eval_method="to_python_no_STL", shots=0, seed=0,
        dataset_name="heat_nc1", out_dir=str(tmp_path),
    )
    run_dir = os.path.join(str(tmp_path), "heat_nc1_shots=0_seed=0", "to_python_no_STL")
    assert res.out_dir == run_dir
    assert os.path.exists(os.path.join(run_dir, "predictions.jsonl"))
    with open(os.path.join(run_dir, "metrics.json")) as f:
        metrics = json.load(f)
    # gibberish generations -> all robustness evals fail, and that is
    # *accounted*, not crashed (reference failure-rate semantics)
    assert metrics["robustness failure rate"] == 1.0
    assert metrics["n_samples"] == 3
    assert "perplexity" in metrics
    with open(os.path.join(run_dir, "predictions.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert all("predicted_python" in r for r in rows)


def test_eval_driver_two_step(driver, items, tmp_path):
    res = driver.run(
        items, eval_method="to_python_two_step", shots=0, seed=0,
        dataset_name="heat_nc1", out_dir=str(tmp_path),
    )
    assert all("predicted_sstl" in p for p in res.predictions)
    assert all("predicted_python" in p for p in res.predictions)


def test_eval_driver_full_pipeline(driver, items):
    res = driver.run(items, eval_method="full_pipeline", shots=0, seed=0)
    assert all("predicted_intermediate_sstl" in p for p in res.predictions)
    # the serve gate's decision is auditable per example
    assert all("gate_fallback" in p and "gate_reason" in p
               for p in res.predictions)


def test_full_pipeline_fallback_uses_no_controller_prompt(items):
    """Non-intervened examples must get the EXACT no-controller coder
    prompt: the round-5 b1 resweep measured the 'intermediate problem'
    framing (dpo_test_sstl_to_python) costing identity/fallback examples
    -0.24..-0.34 utility vs the byte-identical baseline arm on wave."""
    import dataclasses as dc

    from pdec.infer.engine import Generation
    from pdec.stl.ast import Clause
    from pdec.stl.parse_latex import format_sstl_latex, parse_sstl_latex

    class Canned:
        def __init__(self, texts=None):
            self.texts = texts
            self.prompts = []

        def generate(self, prompts, cfg):
            self.prompts.append(list(prompts))
            texts = self.texts or ["gibberish"] * len(prompts)
            return [Generation(t, [1], None, "stop") for t in texts]

    its = list(items)[:3]
    anchors = [it["sstl"] for it in its]
    # ex0: identity emission; ex1: unparseable; ex2: clause-count change
    ctl_texts = [
        anchors[0] + "\n```",
        "not { latex",
        format_sstl_latex(("and", parse_sstl_latex(anchors[2]),
                           parse_sstl_latex(anchors[2]))) + "\n```",
    ]
    translator = Canned([a + "\n```" for a in anchors])
    controller = Canned(ctl_texts)
    coder = Canned()
    driver2 = EvalDriver(
        {"translator": translator, "controller": controller, "coder": coder},
        synthesis=FAST_SYNTH, max_new_tokens=8, temperature=0.0,
    )
    res = driver2.run(its, eval_method="full_pipeline", shots=0, seed=0)
    reasons = [p["gate_reason"] for p in res.predictions]
    assert reasons == ["identity", "cand_unparseable", "structure_reject"]
    coder_prompts = coder.prompts[0]
    for p in coder_prompts:
        # all three fell back -> the two_step arm's instruction, verbatim
        assert "there may be mistakes" in p
        assert "intermediate problem" not in p
    # and a structurally-admissible DECOMPOSITION gets utility-scored
    # (widened screen): an F-subwindow commitment of the anchor clause
    def first_clause(f):
        while not isinstance(f, Clause):
            f = f[1]
        return f

    cl = first_clause(parse_sstl_latex(anchors[0]))
    from pdec.stl.ast import TEMP_F
    sub = dc.replace(cl, temporal_op=TEMP_F,
                     t0=cl.t0, t1=cl.t0 + 0.25 * (cl.t1 - cl.t0))
    controller2 = Canned([format_sstl_latex(sub) + "\n```"])
    coder2 = Canned()
    driver3 = EvalDriver(
        {"translator": Canned([anchors[0] + "\n```"]),
         "controller": controller2, "coder": coder2},
        synthesis=FAST_SYNTH, max_new_tokens=8, temperature=0.0,
    )
    res3 = driver3.run(its[:1], eval_method="full_pipeline", shots=0, seed=0)
    assert res3.predictions[0]["gate_reason"] in (
        "utility_accept", "utility_reject")
    p3 = coder2.prompts[0][0]
    if res3.predictions[0]["gate_reason"] == "utility_accept":
        assert "intermediate problem" in p3
    else:
        assert "there may be mistakes" in p3


def test_ground_truth_simulation(items, tmp_path):
    out = os.path.join(str(tmp_path), "labeled.jsonl")
    labeled, metrics = simulate_ground_truth(
        items, synthesis=FAST_SYNTH, out_path=out
    )
    assert len(labeled) == 3
    assert all(isinstance(r["robustness"], float) for r in labeled)
    total = (
        metrics["gt positive robustness rate"]
        + metrics["gt negative robustness rate"]
        + metrics["gt failed robustness rate"]
    )
    assert total == pytest.approx(1.0)
    assert os.path.exists(out)


def test_subsets_and_skip_existing(driver, items, tmp_path):
    r0 = driver.run(
        items, eval_method="to_python_no_STL", shots=0, seed=0,
        dataset_name="d", out_dir=str(tmp_path), n_subsets=2, subset_id=0,
    )
    r1 = driver.run(
        items, eval_method="to_python_no_STL", shots=0, seed=0,
        dataset_name="d", out_dir=str(tmp_path), n_subsets=2, subset_id=1,
    )
    # 3 items shard into 2 + 1
    assert r0.metrics["n_samples"] + r1.metrics["n_samples"] == 3
    assert os.path.exists(os.path.join(r0.out_dir, "metrics.0.json"))
    assert os.path.exists(os.path.join(r1.out_dir, "metrics.1.json"))
    # skip_existing returns the stored metrics without regenerating
    again = driver.run(
        items, eval_method="to_python_no_STL", shots=0, seed=0,
        dataset_name="d", out_dir=str(tmp_path), n_subsets=2, subset_id=0,
        skip_existing_scores=True,
    )
    assert again.predictions == []
    assert again.metrics["n_samples"] == r0.metrics["n_samples"]


def test_load_from_file_recomputes_metrics(driver, items, tmp_path):
    first = driver.run(
        items, eval_method="to_python_no_STL", shots=0, seed=0,
        dataset_name="lf", out_dir=str(tmp_path),
    )
    again = driver.run(
        items, eval_method="to_python_no_STL", shots=0, seed=0,
        dataset_name="lf", out_dir=str(tmp_path), load_from_file=True,
    )
    assert len(again.predictions) == len(first.predictions)
    assert again.metrics["n_samples"] == first.metrics["n_samples"]


def test_aggregation(driver, items, tmp_path):
    for seed in (0, 1):
        driver.run(
            items, eval_method="to_python_no_STL", shots=0, seed=seed,
            dataset_name="heat_nc1", out_dir=str(tmp_path),
        )
    agg = aggregate_results(str(tmp_path))
    assert "to_python_no_STL" in agg
    stats = agg["to_python_no_STL"]["robustness failure rate"]["heat_nc1"][0]
    assert stats[0] == pytest.approx(1.0)  # mean over 2 seeds
    assert stats[2] == 2
    md = format_markdown_table(agg, "to_python_no_STL")
    assert "## Metric: robustness failure rate" in md
    assert "1.0000" in md
    paths = write_reports(str(tmp_path))
    assert paths and all(os.path.exists(p) for p in paths)


def test_train_style_prompt_bank():
    """train_style nl_to_sstl prompts must end at the bare open fence the
    model saw in training (no test-side scaffold line), and shot examples
    must close their fence."""
    from pdec.data.prompts import FewShotBank

    test_bank = FewShotBank("nl_to_sstl", num_shots=0, dataset="combined")
    train_bank = FewShotBank(
        "nl_to_sstl", num_shots=0, dataset="combined", test_side=False
    )
    tp = test_bank.format_prompt(nl="heat the rod")
    rp = train_bank.format_prompt(nl="heat the rod")
    assert "Spatial Signal Temporal Logic:" in tp
    assert "Spatial Signal Temporal Logic:" not in rp
    assert rp.endswith("```latex\n")

    shot = FewShotBank(
        "nl_to_sstl", num_shots=2, dataset="combined", test_side=False
    )
    prefix = shot.few_shot_prefix()
    assert prefix.count("```latex\n") == 2
    assert prefix.count("\n```\n\n") == 2


def test_repeat_sampling_stds_and_provenance(items, tmp_path):
    """n_repeat_sampling>1: metrics are per-repeat means with '<k> std'
    companions, protocol keys recorded, and the aggregator uses the
    in-combo std when only one seed dir exists (VERDICT r2 weak #3)."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    engine = InferenceEngine(params, TINY, ByteTokenizer(), max_len=512)
    drv = EvalDriver(
        {"translator": engine, "coder": engine},
        synthesis=FAST_SYNTH, max_new_tokens=8,
        temperature=1.0, n_repeat_sampling=3,
    )
    res = drv.run(
        items, eval_method="to_STL", shots=0, seed=0,
        dataset_name="heat_nc1", out_dir=str(tmp_path),
    )
    m = res.metrics
    assert m["n_samples"] == 3 * len(items)
    assert m["n_repeats"] == 3
    assert m["prompt_style"] == "reference"
    assert m["temperature"] == 1.0
    assert m["n_repeat_sampling"] == 3
    assert "edit distance" in m and "edit distance std" in m
    agg = aggregate_results(str(tmp_path))
    mean, std, n = agg["to_STL"]["edit distance"]["heat_nc1"][0]
    assert n == 1
    assert std == pytest.approx(m["edit distance std"])


def test_utility_gain_report(tmp_path):
    """utility_gain pairs full_pipeline vs to_python_two_step robustness
    per example x repeat (paper's 62% headline, reference README.md:34)."""
    from pdec.pipeline.aggregate import (
        controller_utility_gain, format_utility_gain_table,
    )

    base = tmp_path / "heat_nc1_shots=0_seed=0"
    for method, robs in (
        ("full_pipeline", [0.5, -0.1, "failed"]),
        ("to_python_two_step", [0.1, -0.3, 0.2]),
    ):
        d = base / method
        d.mkdir(parents=True)
        with open(d / "predictions.jsonl", "w") as f:
            for i, r in enumerate(robs):
                f.write(json.dumps(
                    {"nl": f"p{i}", "repeat_id": 0, "robustness": r}
                ) + "\n")
    gains = controller_utility_gain(str(tmp_path))
    g = gains["heat_nc1|shots=0"]
    assert g["n_pairs"] == 2  # the 'failed' row is excluded
    assert g["mean_gain"] == pytest.approx((0.4 + 0.2) / 2)
    assert g["win_rate"] == 1.0
    text = format_utility_gain_table(gains)
    assert "heat_nc1|shots=0" in text and "win rate" in text


def test_utility_gain_tail_decomposition(tmp_path):
    """Catastrophic robustness values (<= -90: spec badly violated, a
    heavy-tail sampling event) must be separable from guidance quality:
    clean_mean_gain excludes pairs where either arm is catastrophic and
    the per-arm catastrophic rates are reported, mirroring the
    reference's failure-rates-next-to-MRE reporting
    (read_result.py:137-153)."""
    from pdec.pipeline.aggregate import (
        controller_utility_gain, format_utility_gain_table,
    )

    base = tmp_path / "wave_nc3_shots=2_seed=0"
    for method, robs in (
        ("full_pipeline", [1.0, 2.0, -293.0, 4.0]),
        ("to_python_two_step", [0.5, 2.5, 3.0, -150.0]),
    ):
        d = base / method
        d.mkdir(parents=True)
        with open(d / "predictions.jsonl", "w") as f:
            for i, r in enumerate(robs):
                f.write(json.dumps(
                    {"nl": f"p{i}", "repeat_id": 0, "robustness": r}
                ) + "\n")
    gains = controller_utility_gain(str(tmp_path))
    g = gains["wave_nc3|shots=2"]
    assert g["n_pairs"] == 4
    # raw mean includes the two catastrophic pairs (-296, +154)
    assert g["mean_gain"] == pytest.approx(
        ((0.5) + (-0.5) + (-296.0) + (154.0)) / 4)
    # clean mean sees only the two non-catastrophic pairs
    assert g["clean_mean_gain"] == pytest.approx((0.5 - 0.5) / 2)
    assert g["catastrophic_rate_treatment"] == pytest.approx(0.25)
    assert g["catastrophic_rate_baseline"] == pytest.approx(0.25)
    # conventional midpoint median of [-296, -0.5, 0.5, 154]
    assert g["median_gain"] == pytest.approx(0.0)
    text = format_utility_gain_table(gains)
    assert "clean gain" in text and "cat% ctl/base" in text


def test_utility_gain_chained_metric_key(tmp_path):
    """metric_key="utility_chained" reads the chained-utility field; the
    chained table header names the chained definition."""
    from pdec.pipeline.aggregate import (
        controller_utility_gain, format_utility_gain_table,
    )

    base = tmp_path / "heat_nc1_shots=0_seed=0"
    for method, vals in (
        ("full_pipeline", [0.9, 0.4]),
        ("to_python_two_step", [0.5, 0.5]),
    ):
        d = base / method
        d.mkdir(parents=True)
        with open(d / "predictions.jsonl", "w") as f:
            for i, v in enumerate(vals):
                f.write(json.dumps(
                    {"nl": f"p{i}", "repeat_id": 0, "robustness": -99.0,
                     "utility_chained": v}
                ) + "\n")
    gains = controller_utility_gain(
        str(tmp_path), metric_key="utility_chained")
    g = gains["heat_nc1|shots=0"]
    assert g["mean_gain"] == pytest.approx((0.4 - 0.1) / 2)
    text = format_utility_gain_table(gains, chained=True)
    assert "CHAINED" in text and "(chained)" in text


def test_utility_gain_clustered_ci(tmp_path):
    """The 95% CI is a CLUSTERED bootstrap: repeats of the same example
    share a prompt and are correlated, so resampling must be over example
    clusters, not example x repeat pairs.  With all pairs coming from ONE
    example (any number of repeats) no CI can be computed — it must be
    None and render as n/a, never a fabricated [0, 0]."""
    from pdec.pipeline.aggregate import (
        controller_utility_gain, format_utility_gain_table,
    )

    # single example, 3 repeats -> 3 pairs but 1 cluster -> CI is None
    base = tmp_path / "heat_nc1_shots=0_seed=0"
    for method, robs in (
        ("full_pipeline", [0.5, 0.6, 0.7]),
        ("to_python_two_step", [0.1, 0.2, 0.3]),
    ):
        d = base / method
        d.mkdir(parents=True)
        with open(d / "predictions.jsonl", "w") as f:
            for rep, r in enumerate(robs):
                f.write(json.dumps(
                    {"nl": "p0", "repeat_id": rep, "robustness": r}
                ) + "\n")
    gains = controller_utility_gain(str(tmp_path))
    g = gains["heat_nc1|shots=0"]
    assert g["n_pairs"] == 3 and g["n_clusters"] == 1
    assert g["clean_gain_ci95"] is None
    assert "n/a" in format_utility_gain_table(gains)

    # two examples x 2 repeats: 2 clusters -> a real CI bracketing the
    # constant per-pair gain of +0.4
    base2 = tmp_path / "heat_nc2_shots=0_seed=0"
    for method, offs in (("full_pipeline", 0.4), ("to_python_two_step", 0.0)):
        d = base2 / method
        d.mkdir(parents=True)
        with open(d / "predictions.jsonl", "w") as f:
            for rep in range(2):
                for i in range(2):
                    f.write(json.dumps(
                        {"nl": f"p{i}", "repeat_id": rep,
                         "robustness": 0.1 * i + offs}
                    ) + "\n")
    g2 = controller_utility_gain(str(tmp_path))["heat_nc2|shots=0"]
    assert g2["n_clusters"] == 2
    lo, hi = g2["clean_gain_ci95"]
    assert lo == pytest.approx(0.4) and hi == pytest.approx(0.4)


def test_metric_stream_and_log_file(tmp_path):
    """Training runs must leave a plottable metrics.jsonl and per-step log
    lines in the run dir (VERDICT r2 weak #4: one-line logs)."""
    from pdec.runtime.logging import JsonlMetricSink, get_logger

    run_dir = str(tmp_path / "run")
    logger = get_logger("pdec.cli.train", log_dir=run_dir)
    sink = JsonlMetricSink(run_dir)
    child = get_logger("pdec.train")  # no own file handler: must propagate
    for step in range(1, 4):
        child.info("step %d", step)
        sink(step, {"loss": 1.0 / step, "lr": 1e-4, "note": "skip-me"})
    sink.close()
    log_path = os.path.join(run_dir, "log-node-0.log")
    with open(log_path) as f:
        lines = f.read().strip().splitlines()
    assert sum("step" in l for l in lines) >= 3
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert [r["step"] for r in recs] == [1, 2, 3]
    assert all("loss" in r and "lr" in r and "note" not in r for r in recs)


def test_rescore_from_cached_predictions_adds_chained_utility(tmp_path):
    """EvalDriver.run(load_from_file=True) with no engines recomputes
    metrics from predictions.jsonl and attaches per-prediction
    utility_chained + the "utility chained" metric — the real_run.py
    `rescore` stage's contract for upgrading already-swept cells."""
    from tests.test_stl_parse import HEAT_PROGRAM
    from pdec.pipeline.evaluate import EvalDriver

    cell = tmp_path / "tiny_shots=0_seed=0" / "to_python_two_step"
    cell.mkdir(parents=True)
    preds = [
        {"nl": "x", "repeat_id": r, "predicted_python": HEAT_PROGRAM,
         "predicted_sstl": "", "logprobs": [-0.5]}
        for r in range(2)
    ]
    with open(cell / "predictions.jsonl", "w") as f:
        for p in preds:
            f.write(json.dumps(p) + "\n")
    items = [{"nl": "x", "sstl": "", "python": HEAT_PROGRAM,
              "robustness": -1.0}]
    driver = EvalDriver({}, synthesis=FAST_SYNTH, n_repeat_sampling=2)
    res = driver.run(
        items, eval_method="to_python_two_step", shots=0, seed=0,
        dataset_name="tiny", out_dir=str(tmp_path), load_from_file=True,
    )
    assert "utility chained" in res.metrics
    with open(cell / "predictions.jsonl") as f:
        saved = [json.loads(l) for l in f]
    assert all(isinstance(p.get("utility_chained"), float) for p in saved)
