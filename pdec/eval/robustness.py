"""Robustness evaluation of generated programs — the Gurobi bridge, replaced.

Reference contract (``eval_robustness_wrapper.py:13-21``, reached via a
``conda run -n pdecontrol`` subprocess per example, ``eval_script.py:43-79``):

    eval_robustness(nl, code) -> (robustness, runtime)

i.e. parse/execute the coder-dialect program, synthesize the optimal
boundary control for its STL spec (Gurobi MILP), return the achieved
robustness and solver runtime.

Here the same contract is served in-process: safe parse
(`pdec.stl.program`), lowering (`pdec.physics.problem`), gradient synthesis
(`pdec.control.synthesis`).  The batched entry groups programs by problem
family (kind, mesh size, horizon bucket) and runs each family as ONE
device dispatch — thousands of MILP-equivalents per second instead of one
300-second CPU solve at a time (``simulate_gt.py:62-69``).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from pdec.control.synthesis import (
    FAMILY_BUCKET,
    FAMILY_DISPATCH,
    SynthesisConfig,
    evaluate_controls,
    synthesize_batch,
)
from pdec.physics.problem import (
    problem_from_program,
    problems_from_programs,
    stack_systems,
)
from pdec.stl.ast import compile_spec, stack_specs
from pdec.stl.program import FemProgram, parse_fem_program

Scalar = Union[float, str]

_FAILED = "failed"


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# AOT-compiled executables cached per (family shape, config): lower+compile
# happens OUTSIDE the timed region so the reported per-item runtime measures
# the solve only, never XLA compilation (the reference's ``runtime`` is the
# Gurobi solve time, ``eval_robustness_wrapper.py:16-21``; folding a one-off
# compile into the first family bucket skewed ``simulation time mre``).
_synthesize_jit = jax.jit(
    synthesize_batch, static_argnames=("max_steps", "config")
)


def _synthesize_warm(systems, clauses, programs, key, warm, *, max_steps,
                     config):
    return synthesize_batch(
        systems, clauses, programs, key, max_steps, config, init_knots=warm
    )


_synthesize_warm_jit = jax.jit(
    _synthesize_warm, static_argnames=("max_steps", "config")
)


def _synthesize_salted(systems, clauses, programs, key, salts, *, max_steps,
                       config):
    return synthesize_batch(
        systems, clauses, programs, key, max_steps, config, lane_salts=salts
    )


_synthesize_salted_jit = jax.jit(
    _synthesize_salted, static_argnames=("max_steps", "config")
)


def _synthesize_warm_salted(systems, clauses, programs, key, warm, salts, *,
                            max_steps, config):
    return synthesize_batch(
        systems, clauses, programs, key, max_steps, config,
        init_knots=warm, lane_salts=salts,
    )


_synthesize_warm_salted_jit = jax.jit(
    _synthesize_warm_salted, static_argnames=("max_steps", "config")
)


def program_salt(prog: FemProgram, formula=None) -> int:
    """Content-derived PRNG salt: a stable int32 identifying the synthesis
    PROBLEM (physics + spec), independent of source-text formatting and of
    batch position.  Two programs that parse to the same problem score
    identically under salted synthesis (``synthesize_batch`` lane_salts) —
    the determinism the reference gets for free from Gurobi and that the
    protocol's ``robustness accuracy`` metric presumes."""
    import zlib

    from pdec.stl.ast import formula_clauses

    f = formula if formula is not None else prog.formula
    parts = [
        prog.kind, prog.n_elements,
        round(prog.length, 9), round(prog.dt, 9), round(prog.t_final, 9),
        None if prog.g0 is None else round(prog.g0, 9),
        None if prog.g1 is None else round(prog.g1, 9),
    ]
    for pw in (prog.rho, prog.elastic):
        parts += [round(pw.outside, 9), round(pw.inside, 9),
                  round(pw.lo, 9), round(pw.hi, 9)]

    def keyf(g):
        from pdec.stl.ast import Clause

        if isinstance(g, Clause):
            return ("c", g.temporal_op, g.cmp,
                    round(g.t0, 9), round(g.t1, 9),
                    round(g.x0, 9), round(g.x1, 9),
                    round(g.m, 9), round(g.b, 9))
        return (g[0], keyf(g[1]), keyf(g[2]))

    parts.append(keyf(f))
    return zlib.crc32(repr(parts).encode()) & 0x7FFFFFFF
_score_jit = jax.jit(
    jax.vmap(evaluate_controls, in_axes=(0, 0, 0, 0, None, None)),
    static_argnums=(4, 5),
)
_compiled_cache: dict = {}


def _shape_sig(*trees):
    out = []
    for tree in trees:
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "shape"):
                out.append((tuple(leaf.shape), str(leaf.dtype)))
            else:  # static scalars riding along in the arg tuple
                out.append(("static", repr(leaf)))
    return tuple(out)


def _compiled(jitted, sig_extra, args, kwargs):
    key = (id(jitted), _shape_sig(list(args)), sig_extra)
    fn = _compiled_cache.get(key)
    if fn is None:
        fn = jitted.lower(*args, **kwargs).compile()
        _compiled_cache[key] = fn
    return fn


def eval_robustness_batch(
    codes: Sequence[str],
    key: Optional[jax.Array] = None,
    config: Optional[SynthesisConfig] = None,
    gt_formulas=None,
    bucket_granularity: int = 64,
    chain: bool = False,
    return_both: bool = False,
    deterministic_keys: bool = False,
) -> List[Tuple[Scalar, ...]]:
    """Synthesize + score a batch of coder-dialect programs.

    Returns per-program ``(robustness, runtime_seconds)``; unparseable
    programs get ``("failed", "failed")`` (reference failure sentinel).
    With ``chain=True, return_both=True`` each entry is
    ``(plain_robustness, runtime, chained_robustness)`` — both utilities
    from ONE phase-A synthesis (the eval driver needs both metrics;
    re-running phase A for the chained pass would add ~50% wasted device
    time to every cell).

    ``gt_formulas``: optional per-program ground-truth `Formula` (parsed
    from the NL); when given, the control is synthesized on the *program's*
    spec but scored on the ground truth — the utility definition used for
    DPO scoring (reference two-stage evaluation).

    ``chain``: with ``gt_formulas``, run TWO-PHASE chained synthesis: phase
    A optimizes the program's own spec (the intermediate — a predicted
    translation or a controller subgoal), phase B re-optimizes the
    ground-truth spec with phase A's optimum injected into the start
    portfolio (the gradient analogue of a Gurobi MIP warm start).  The
    anytime incumbent makes the chained utility >= the plain
    synthesize-on-intermediate-score-on-GT utility, so an intermediate spec
    can guide the search but never silently sabotage the true objective.
    Both arms of a controller-vs-no-controller comparison should use the
    same ``chain`` setting: the phases are compute-identical, so the delta
    isolates the quality of the intermediate spec as a warm-start seed.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    parsed: List[Optional[FemProgram]] = []
    for code in codes:
        try:
            parsed.append(parse_fem_program(code))
        except Exception:
            parsed.append(None)

    results: List[Tuple[Scalar, Scalar]] = [(_FAILED, _FAILED)] * len(codes)

    # Group by family: (kind, n_elements, horizon bucket).
    groups = {}
    for i, prog in enumerate(parsed):
        if prog is None:
            continue
        n_steps = int(round(prog.t_final / prog.dt))
        # quantize horizons to the family's canonical bucket when they fit:
        # one synthesis executable per family instead of one per 64-step
        # horizon bucket (padded steps are masked out of robustness windows)
        fam = FAMILY_BUCKET.get(prog.kind)
        # pathological-size guard: a MODEL-GENERATED program can demand an
        # arbitrary time grid (garbled t_final/dt) or spatial resolution;
        # synthesis HBM scales as lanes x (T/stride) x X x clauses, and one
        # monster program inflates its whole group's static shapes
        # (measured: a matched-shot wave batch requested 25.35G of the
        # chip's 15.75G at COMPILE time). The reference bounds pathological
        # programs with a per-problem wall-clock timeout (simulate_gt.py);
        # with AOT static shapes the analog is a size clamp — oversize
        # programs stay _FAILED, counted in 'robustness failure rate' like
        # any unsolvable generation (corpus programs: n_elements == 20,
        # n_steps <= the family bucket, so 64 / 4x give wide headroom).
        if prog.n_elements > 64 or n_steps > 4 * (fam or 2048):
            continue
        if fam is not None and n_steps <= fam:
            bucket_base = fam
        else:
            bucket_base = _round_up(max(n_steps, 1), bucket_granularity)
        bucket = _round_up(
            bucket_base,
            (config or SynthesisConfig()).chunk,
        )
        groups.setdefault((prog.kind, prog.n_elements, bucket), []).append(i)

    for (kind, n_el, bucket), idxs in groups.items():
        # config=None -> the family's shipped defaults (per-family strides;
        # SynthesisConfig.for_family); an explicit config is used verbatim
        cfg = config if config is not None else SynthesisConfig.for_family(kind)
        # tight clause padding: the clause loop inside synthesis costs
        # proportionally to the padded slot count (corpus formulas have
        # <= 3 clauses; 4 slots cover them at half the default-8 cost)
        from pdec.stl.ast import formula_clauses

        def n_cl(f):
            return len(formula_clauses(f)) if f is not None else 0

        group_max = 1
        for i in idxs:
            group_max = max(group_max, n_cl(parsed[i].formula))
            if gt_formulas is not None:
                group_max = max(group_max, n_cl(gt_formulas[i]))
        mc = 4 if group_max <= 4 else 8
        progs_ok: List[FemProgram] = []
        specs = []
        score_specs = []
        ok_idxs = []
        for i in idxs:
            prog = parsed[i]
            try:
                spec = compile_spec(prog.formula, mc, 2 * mc)
                if gt_formulas is not None and gt_formulas[i] is not None:
                    score_spec = compile_spec(gt_formulas[i], mc, 2 * mc)
                else:
                    score_spec = spec
            except Exception:
                continue
            progs_ok.append(prog)
            specs.append(spec)
            score_specs.append(score_spec)
            ok_idxs.append(i)
        if not ok_idxs:
            continue

        # Chunk each group at the family's HBM lane budget, then pad each
        # chunk to a power of two so repeated sweeps over different dataset
        # sizes reuse one compiled executable per (family, bucket, size).
        cap = FAMILY_DISPATCH.get(kind, 256)
        fam_bucket = FAMILY_BUCKET.get(kind)
        if fam_bucket is not None and bucket > fam_bucket:
            # keep the dispatch HBM footprint ~constant when a group's
            # (legitimately oversize, guard-admitted) horizon inflates
            # the per-lane robustness tensors
            cap = max(8, (cap * fam_bucket) // bucket)
        for s in range(0, len(ok_idxs), cap):
            c_progs = progs_ok[s:s + cap]
            c_specs = specs[s:s + cap]
            c_score = score_specs[s:s + cap]
            c_idxs = ok_idxs[s:s + cap]
            n_real = len(c_idxs)
            n_pad = max(1 << (n_real - 1).bit_length(), 8)
            c_progs = c_progs + [c_progs[0]] * (n_pad - n_real)
            c_specs = c_specs + [c_specs[0]] * (n_pad - n_real)
            c_score = c_score + [c_score[0]] * (n_pad - n_real)

            # Batched FEM lowering: one vmap dispatch + one batched eig for
            # the whole chunk.  Per-item lowering pays a host<->device round
            # trip (~0.2 s each through the device tunnel) per program —
            # ~3 solves/s vs ~570/s batched at datagen scale.  Fall back to
            # the per-item path for families the batched builder doesn't
            # cover (e.g. coupled rods) or rare defective-matrix items.
            try:
                stacked = problems_from_programs(c_progs, max_steps=bucket)
            except Exception:
                systems, f_progs, f_specs, f_score, f_idxs = [], [], [], [], []
                for j in range(n_real):
                    try:
                        systems.append(
                            problem_from_program(c_progs[j],
                                                 max_steps=bucket))
                    except Exception:
                        continue
                    f_progs.append(c_progs[j])
                    f_specs.append(c_specs[j])
                    f_score.append(c_score[j])
                    f_idxs.append(c_idxs[j])
                if not systems:
                    continue
                n_real = len(systems)
                n_pad = max(1 << (n_real - 1).bit_length(), 8)
                while len(systems) < n_pad:
                    systems.append(systems[0])
                    f_progs.append(f_progs[0])
                    f_specs.append(f_specs[0])
                    f_score.append(f_score[0])
                stacked = stack_systems(systems)
                c_progs, c_specs, c_score, c_idxs = (
                    f_progs, f_specs, f_score, f_idxs)

            cl, pr = stack_specs(c_specs)
            salts = None
            if deterministic_keys:
                salts = jnp.asarray(
                    [program_salt(p) for p in c_progs], dtype=jnp.int32)
            if salts is None:
                synth_args = (stacked, jnp.asarray(cl), jnp.asarray(pr), key)
                synth_fn = _compiled(
                    _synthesize_jit, (bucket, cfg), synth_args,
                    dict(max_steps=bucket, config=cfg),
                )
            else:
                synth_args = (
                    stacked, jnp.asarray(cl), jnp.asarray(pr), key, salts)
                synth_fn = _compiled(
                    _synthesize_salted_jit, (bucket, cfg, "salted"),
                    synth_args, dict(max_steps=bucket, config=cfg),
                )
            t_start = time.perf_counter()
            res = synth_fn(*synth_args)

            chained_scores = None
            if gt_formulas is not None and chain:
                # Phase B: re-optimize the GT spec warm-started from phase
                # A's optimum (see docstring); hard robustness is on GT.
                cl_s, pr_s = stack_specs(c_score)
                if salts is None:
                    warm_args = (
                        stacked, jnp.asarray(cl_s), jnp.asarray(pr_s),
                        jax.random.fold_in(key, 1), res.knots,
                    )
                    warm_fn = _compiled(
                        _synthesize_warm_jit, (bucket, cfg, "chain"),
                        warm_args, dict(max_steps=bucket, config=cfg),
                    )
                else:
                    warm_args = (
                        stacked, jnp.asarray(cl_s), jnp.asarray(pr_s),
                        jax.random.fold_in(key, 1), res.knots, salts,
                    )
                    warm_fn = _compiled(
                        _synthesize_warm_salted_jit,
                        (bucket, cfg, "chain-salted"),
                        warm_args, dict(max_steps=bucket, config=cfg),
                    )
                chained = warm_fn(*warm_args).robustness
                if return_both:
                    # plain rescore from the SAME phase-A result
                    score_args = (
                        stacked, res.controls, jnp.asarray(cl_s),
                        jnp.asarray(pr_s),
                    )
                    score_fn = _compiled(
                        _score_jit, (bucket, cfg.chunk),
                        score_args + (bucket, cfg.chunk), {},
                    )
                    scores = score_fn(*score_args)
                    chained_scores = np.asarray(chained)
                else:
                    scores = chained
            elif gt_formulas is not None:
                # Re-score the synthesized controls against the GT spec.
                cl_s, pr_s = stack_specs(c_score)
                score_args = (
                    stacked, res.controls, jnp.asarray(cl_s),
                    jnp.asarray(pr_s),
                )
                score_fn = _compiled(
                    _score_jit, (bucket, cfg.chunk),
                    score_args + (bucket, cfg.chunk), {},
                )
                scores = score_fn(*score_args)
            else:
                scores = res.robustness
            # device->host transfer of the scores is the completion barrier
            scores = np.asarray(scores)

            elapsed = time.perf_counter() - t_start
            per_item = elapsed / max(n_real, 1)
            for j, i in enumerate(c_idxs[:n_real]):
                if chained_scores is not None:
                    results[i] = (float(scores[j]), per_item,
                                  float(chained_scores[j]))
                else:
                    results[i] = (float(scores[j]), per_item)

    return results


def eval_robustness_program(
    code: str,
    key: Optional[jax.Array] = None,
    config: Optional[SynthesisConfig] = None,
) -> Tuple[Scalar, Scalar]:
    """Single-program form of the reference ``eval_robustness`` contract."""
    return eval_robustness_batch([code], key=key, config=config)[0]
