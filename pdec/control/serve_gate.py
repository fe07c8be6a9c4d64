"""Serve-time UTILITY gate for controller-proposed subgoals.

The round-4 sweep measured that a structure-only envelope gate
(``pdec.stl.guard``) is not enough: structurally-legal subgoals can still
steer the coder/synthesis pipeline to a measurably WORSE control than no
intervention at all (clean utility gain significantly negative on wave
cells).  A guidance layer must never make things worse than the identity
action — the reference controller's role is explicitly *optional* guidance
(reference ``README.md:28``).

This gate therefore scores every structurally-admissible intervention
before accepting it, with the exact utility definition the controller is
trained and deployed under (``pdec.pipeline.dpo_datagen.build_dpo_pairs``,
chained two-phase synthesis):

  phase A   synthesize the candidate subgoal spec,
  phase B   re-optimize the ANCHOR spec (the translator's output — the
            serve-time best estimate of the true objective) with phase A's
            optimum injected into the start portfolio.

The identity arm runs the same two phases with the anchor spec as its own
phase-A spec, so both arms are compute-matched and share the synthesis
noise character.  The candidate is accepted only when it beats identity by
more than the measured multi-start noise floor (``floor_frac``, the same
floor DPO pair selection uses — ``select_preference``), making the gate
provably non-harmful up to that floor *under the anchor objective*.

No ground truth is consulted: the physics (rod geometry, materials, time
grid) is a deterministic parse of the NL *input* (``parse_nl_problem`` —
those constants appear verbatim in the problem statement), and the
objective is the translated spec, never the GT formula.

Reference parity note: the reference pipes the controller's SSTL straight
to the coder (``run_testing.sh:11-17``); both gates are deployment-
robustness features of the rebuild, recorded per example in
``predictions.jsonl`` (``gate_fallback``, ``gate_reason``,
``gate_u_identity``, ``gate_u_candidate``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pdec.control.synthesis import (
    FAMILY_BUCKET,
    FAMILY_DISPATCH,
    SynthesisConfig,
    synthesize_batch,
)
from pdec.data.nl import parse_nl_problem
from pdec.physics.problem import problems_from_programs, take_systems
from pdec.stl.ast import Clause, Formula, compile_spec, formula_clauses, stack_specs
from pdec.stl.guard import _junction_ops, decomposition_admissible, same_structure


@dataclasses.dataclass
class GateDecision:
    sstl: str            # the spec handed to the coder
    fell_back: bool      # True when the intervention was rejected
    reason: str          # identity | no_anchor | cand_unparseable |
    #                      structure_reject | physics_unparseable |
    #                      utility_accept | utility_reject
    u_identity: float = math.nan
    u_candidate: float = math.nan


def _formulas_equal(a: Formula, b: Formula, rtol: float = 1e-6) -> bool:
    """Numeric identity up to latex round-trip formatting noise."""
    if _junction_ops(a) != _junction_ops(b):
        return False
    ca, cb = formula_clauses(a), formula_clauses(b)
    if len(ca) != len(cb):
        return False

    def close(x, y):
        return math.isclose(x, y, rel_tol=rtol, abs_tol=1e-9)

    for p, q in zip(ca, cb):
        if p.temporal_op != q.temporal_op or p.cmp != q.cmp:
            return False
        if not all(close(getattr(p, f), getattr(q, f))
                   for f in ("x0", "x1", "t0", "t1", "b", "m")):
            return False
    return True


def _pad_to(n: int, quantum: int) -> int:
    return max(((n + quantum - 1) // quantum) * quantum, quantum)


def score_subgoals_chained(
    programs: Sequence,           # FemProgram per example (physics source)
    anchor_formulas: Sequence[Formula],
    cand_formulas: Sequence[Formula],
    config: Optional[SynthesisConfig] = None,
    key: Optional[jax.Array] = None,
    n_seeds: int = 1,
) -> List[tuple]:
    """-> per example ``(u_identity, u_candidate)`` under chained two-phase
    synthesis with the anchor spec as the phase-B objective (see module
    docstring).  Batched per problem family exactly like DPO-pair scoring
    (``build_dpo_pairs``): one device dispatch per (family, cap) chunk."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = len(programs)
    out: List[Optional[tuple]] = [None] * n

    groups: Dict = {}
    for i, prog in enumerate(programs):
        bucket = FAMILY_BUCKET.get(prog.kind)
        if bucket is None:
            n_steps = int(round(prog.t_final / prog.dt))
            bucket = max(((n_steps + 63) // 64) * 64, 64)
        groups.setdefault((prog.kind, prog.n_elements, bucket), []).append(i)

    for (kind, n_el, bucket), ex_idxs in groups.items():
        cfg = config if config is not None else SynthesisConfig.for_family(kind)
        sys_ex = problems_from_programs(
            [programs[i] for i in ex_idxs], max_steps=bucket)
        # flat order: [id_0, cand_0, id_1, cand_1, ...] — phase A spec
        # alternates anchor/candidate; phase B objective is the anchor for
        # every slot.
        positions, a_specs, b_specs = [], [], []
        for p, i in enumerate(ex_idxs):
            anchor = compile_spec(anchor_formulas[i])
            cand = compile_spec(cand_formulas[i])
            positions += [p, p]
            a_specs += [anchor, cand]
            b_specs += [anchor, anchor]
        # pad to the next power of two (>= 8) so repeated gate calls with
        # different intervention counts reuse one compiled executable per
        # (family, bucket, size); chunk at the family's HBM lane budget
        cap = FAMILY_DISPATCH.get(kind, 256)
        n_real = len(positions)
        n_pad = max(1 << (n_real - 1).bit_length(), 8)
        if n_pad > cap:
            n_pad = _pad_to(n_real, cap)
        positions += [positions[-1]] * (n_pad - n_real)
        a_specs += [a_specs[-1]] * (n_pad - n_real)
        b_specs += [b_specs[-1]] * (n_pad - n_real)
        cl_a, pr_a = stack_specs(a_specs)
        cl_b, pr_b = stack_specs(b_specs)
        cl_a, pr_a = jnp.asarray(cl_a), jnp.asarray(pr_a)
        cl_b, pr_b = jnp.asarray(cl_b), jnp.asarray(pr_b)
        all_scores = []
        for s in range(0, n_pad, cap):
            stacked = take_systems(sys_ex, positions[s:s + cap])
            reps = []
            for rep in range(max(n_seeds, 1)):
                k_rep = jax.random.fold_in(key, 2 * rep)
                res = jax.jit(
                    synthesize_batch, static_argnames=("max_steps", "config")
                )(stacked, cl_a[s:s + cap], pr_a[s:s + cap], k_rep,
                  max_steps=bucket, config=cfg)
                chained = jax.jit(
                    synthesize_batch, static_argnames=("max_steps", "config")
                )(stacked, cl_b[s:s + cap], pr_b[s:s + cap],
                  jax.random.fold_in(key, 2 * rep + 1), max_steps=bucket,
                  config=cfg, init_knots=res.knots).robustness
                reps.append(np.asarray(chained))
            all_scores.append(np.mean(reps, axis=0))
        scores = np.concatenate(all_scores)
        for p, i in enumerate(ex_idxs):
            out[i] = (float(scores[2 * p]), float(scores[2 * p + 1]))
    return [o if o is not None else (math.nan, math.nan) for o in out]


def utility_gate_batch(
    nls: Sequence[str],
    base_sstls: Sequence[str],
    cand_sstls: Sequence[str],
    floor_frac: float = 0.03,
    config: Optional[SynthesisConfig] = None,
    key: Optional[jax.Array] = None,
    n_seeds: int = 1,
) -> List[GateDecision]:
    """Gate a batch of controller subgoals against their translator anchors.

    Cheap structural screening first (``pdec.stl.guard.same_structure``);
    survivors that actually differ from the anchor are utility-scored in
    one batched synthesis pass and accepted only when
    ``u_cand - u_id > floor_frac * (|u_id| + 1)`` — the identity-anchored
    noise floor DPO pair selection uses (``select_preference``)."""
    from pdec.stl.parse_latex import parse_sstl_latex

    n = len(nls)
    decisions: List[Optional[GateDecision]] = [None] * n
    score_idx: List[int] = []
    score_progs, score_anchor, score_cand = [], [], []
    for i in range(n):
        base, cand = base_sstls[i], cand_sstls[i]
        try:
            base_f = parse_sstl_latex(base)
        except Exception:
            # nothing to anchor on (failed translation): preserve the
            # ungated behavior and pass the candidate through
            decisions[i] = GateDecision(cand, False, "no_anchor")
            continue
        try:
            cand_f = parse_sstl_latex(cand)
        except Exception:
            decisions[i] = GateDecision(base, True, "cand_unparseable")
            continue
        if _formulas_equal(base_f, cand_f):
            decisions[i] = GateDecision(base, False, "identity")
            continue
        if not (same_structure(base_f, cand_f)
                or decomposition_admissible(base_f, cand_f)):
            # admissible moves span the DPO training pool: numeric rewrites
            # of the same structure, disjunct commitments, and structured
            # decompositions (time-phase / setup-prefix / spatial-focus) —
            # see ``propose_subgoals``.  Everything else is out of training
            # support; the round-3 sweep measured such emissions as the
            # entire catastrophic tail.
            decisions[i] = GateDecision(base, True, "structure_reject")
            continue
        try:
            prog = parse_nl_problem(nls[i])
        except Exception:
            # can't verify a benefit -> don't intervene
            decisions[i] = GateDecision(base, True, "physics_unparseable")
            continue
        score_idx.append(i)
        score_progs.append(prog)
        score_anchor.append(base_f)
        score_cand.append(cand_f)

    if score_idx:
        scores = score_subgoals_chained(
            score_progs, score_anchor, score_cand,
            config=config, key=key, n_seeds=n_seeds,
        )
        for i, (u_id, u_cand) in zip(score_idx, scores):
            floor = floor_frac * (abs(u_id) + 1.0)
            if math.isfinite(u_cand) and u_cand - u_id > floor:
                decisions[i] = GateDecision(
                    cand_sstls[i], False, "utility_accept", u_id, u_cand)
            else:
                decisions[i] = GateDecision(
                    base_sstls[i], True, "utility_reject", u_id, u_cand)
    assert all(d is not None for d in decisions)
    return decisions  # type: ignore[return-value]
