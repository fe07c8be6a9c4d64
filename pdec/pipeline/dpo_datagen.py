"""DPO preference-pair construction: intermediate-subgoal utility scoring.

The reference's DPO training data (rows of ``{anchor, w_utility, w_time,
w_sstl, l_utility, l_time, l_sstl, dataset_class, pidx, nc}``, reference
``train/scripts/utils/loader.py:265``) is downloaded, not constructed
in-repo.  This module builds such pairs from scratch:

1. for each problem, propose candidate *intermediate* SSTL subgoals
   (``propose_subgoals``: disjunct commitments, time-phase / setup-prefix /
   spatial-focus decompositions, plus numeric perturbations — the kinds of
   subgoals the controller LLM is trained to emit),
2. score each candidate's *utility*: synthesize the control that optimizes
   the candidate, then evaluate the achieved hard robustness against the
   ORIGINAL spec (two-stage evaluation — candidates only win by actually
   helping the true objective),
3. emit (winner, loser) pairs by utility.

All candidates across the dataset are scored in ONE batched synthesis
dispatch — the pod-scale replacement for per-pair Gurobi scoring.
"""

from __future__ import annotations

import dataclasses
import random
import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp

from pdec.control.synthesis import SynthesisConfig, synthesize_batch, evaluate_controls
from pdec.data.generator import GeneratedExample
from pdec.physics.problem import problems_from_programs, take_systems
from pdec.stl.ast import Clause, Formula, compile_spec, formula_clauses, stack_specs
from pdec.stl.parse_latex import format_sstl_latex


def _perturb_clause(rng: random.Random, c: Clause, t_final: float) -> Clause:
    """One candidate-subgoal move on a clause."""
    move = rng.choice(["offset", "tighten_time", "early", "slope", "relax"])
    if move == "relax":
        # ease the threshold in the satisfying direction ("solve an easier
        # version first"): under chained scoring an easier subgoal is the
        # canonical useful warm start — its optimum sits inside the true
        # feasible region's basin instead of fighting the binding
        # constraint from the first iteration
        from pdec.stl.ast import CMP_GT, CMP_GE

        delta = rng.uniform(0.1, 0.4) * (abs(c.b) + 1.0)
        if c.cmp in (CMP_GT, CMP_GE):
            return dataclasses.replace(c, b=c.b - delta)
        return dataclasses.replace(c, b=c.b + delta)
    if move == "offset":
        delta = rng.uniform(-0.15, 0.15) * (abs(c.b) + 1.0)
        return dataclasses.replace(c, b=c.b + delta)
    if move == "tighten_time":
        width = c.t1 - c.t0
        shrink = rng.uniform(0.1, 0.4) * width
        return dataclasses.replace(c, t0=c.t0 + shrink / 2, t1=c.t1 - shrink / 2)
    if move == "early":
        shift = rng.uniform(0.1, 0.3) * c.t0
        return dataclasses.replace(c, t0=max(c.t0 - shift, 0.0),
                                   t1=max(c.t1 - shift, c.t0 * 0.5 + 0.01))
    delta_m = rng.uniform(-0.3, 0.3) * (abs(c.m) + 1e-3)
    return dataclasses.replace(c, m=c.m + delta_m)


def _or_nodes(f: Formula, path=()) -> List[tuple]:
    """Paths (sequences of 0/1 child picks) to every ``or`` junction."""
    if isinstance(f, Clause):
        return []
    op, left, right = f
    out = [path] if op == "or" else []
    out += _or_nodes(left, path + (0,))
    out += _or_nodes(right, path + (1,))
    return out


def _replace_at(f: Formula, path: tuple, side: int) -> Formula:
    """Replace the junction at ``path`` with its ``side``-th child."""
    if not path:
        return f[1 + side]
    op, left, right = f
    if path[0] == 0:
        return (op, _replace_at(left, path[1:], side), right)
    return (op, left, _replace_at(right, path[1:], side))


def _clause_decompositions(c: Clause, t_final: float) -> List[Clause]:
    """Structured DECOMPOSITION subgoals of one clause — the moves with
    real oracle headroom (round-4 measurement, runs/real/oracle_headroom
    .json: random numeric nudges cap capturable gain under 1% relative
    because multi-start gradient synthesis already solves single-basin
    problems; headroom lives in DISCRETE commitments the smooth optimizer
    cannot make).  Three families, all "the paper's intermediate-reasoning
    concept" (reference README.md:28):

    - time-phase commitment: k narrow F-subwindows tiling [t0, t1] — for
      oscillatory (wave) dynamics, WHICH moment the profile is reached is
      a basin choice;
    - setup prefix: reach the profile BEFORE the window opens (be there
      at t0 rather than fighting the constraint mid-window);
    - spatial focus: commit to a sub-region of [x0, x1] first.
    """
    from pdec.stl.ast import TEMP_F

    out: List[Clause] = []
    width = c.t1 - c.t0
    if width > 1e-6:
        k = 4
        sub = width / k
        for j in range(k):
            a = c.t0 + j * sub
            out.append(dataclasses.replace(
                c, temporal_op=TEMP_F, t0=a, t1=a + sub))
    if c.t0 > 1e-3 * max(t_final, 1e-9):
        out.append(dataclasses.replace(
            c, temporal_op=TEMP_F, t0=0.3 * c.t0, t1=c.t0))
    xw = c.x1 - c.x0
    if xw > 1e-6:
        out.append(dataclasses.replace(
            c, x0=c.x0 + 0.25 * xw, x1=c.x1 - 0.25 * xw))
        out.append(dataclasses.replace(c, x1=c.x0 + 0.5 * xw))
        out.append(dataclasses.replace(c, x0=c.x0 + 0.5 * xw))
    return out


def _clause_paths(f: Formula, path=()) -> List[tuple]:
    """Pre-order paths to every clause leaf."""
    if isinstance(f, Clause):
        return [path]
    _, left, right = f
    return _clause_paths(left, path + (0,)) + _clause_paths(right, path + (1,))


def _replace_clause_at(f: Formula, path: tuple, new: Clause) -> Formula:
    if isinstance(f, Clause):
        assert not path
        return new
    op, left, right = f
    if path[0] == 0:
        return (op, _replace_clause_at(left, path[1:], new), right)
    return (op, left, _replace_clause_at(right, path[1:], new))


def _formula_key(f: Formula) -> tuple:
    if isinstance(f, Clause):
        return ("c",) + tuple(
            round(getattr(f, k), 9) if isinstance(getattr(f, k), float)
            else getattr(f, k)
            for k in ("temporal_op", "t0", "t1", "x0", "x1", "m", "b", "cmp")
        )
    op, left, right = f
    return (op, _formula_key(left), _formula_key(right))


def propose_subgoals(
    rng: random.Random, f: Formula, t_final: float, n_candidates: int = 8,
) -> List[Formula]:
    """The round-5 candidate pool: ``[identity] + all disjunct commitments
    + structured clause decompositions (shuffled) + random perturbation
    fill``, deduplicated, truncated to ``n_candidates``.

    Identity is ALWAYS candidate 0 (see `build_dpo_pairs`).  Disjunct
    commitments come first because branch choice is the highest-headroom
    move class — it is the gradient analogue of the reference MILP's
    integer branching (SURVEY §7.3)."""
    from pdec.stl.guard import _restrictions

    cands: List[Formula] = [f]
    seen = {_formula_key(f)}

    def add(g: Formula) -> None:
        k = _formula_key(g)
        if k not in seen:
            seen.add(k)
            cands.append(g)

    for variant in _restrictions(f):
        add(variant)

    decomp: List[Formula] = []
    for path in _clause_paths(f):
        node = f
        for side in path:
            node = node[1 + side]
        for new_c in _clause_decompositions(node, t_final):
            decomp.append(_replace_clause_at(f, path, new_c))
    rng.shuffle(decomp)
    for g in decomp:
        if len(cands) >= n_candidates:
            break
        add(g)

    guard = 0
    while len(cands) < n_candidates and guard < 20 * n_candidates:
        guard += 1
        add(_perturb_formula(rng, f, t_final))
    return cands[:n_candidates]


def _perturb_formula(rng: random.Random, f: Formula, t_final: float) -> Formula:
    # Disjunct branching: commit to ONE side of an `or` — the gradient
    # analogue of the integer branching Gurobi's MILP does on disjunctions
    # (SURVEY §7.3 names disjunctions as the correctness risk of the
    # smooth relaxation).  A subgoal that picks the RIGHT disjunct
    # warm-starts the true objective into the correct basin, which is
    # exactly the kind of guidance a controller can learn to emit; the
    # soft-max over disjuncts gives the optimizer no such commitment.
    ors = _or_nodes(f)
    if ors and rng.random() < 0.5:
        path = rng.choice(ors)
        return _replace_at(f, path, rng.choice([0, 1]))
    if isinstance(f, Clause):
        return _perturb_clause(rng, f, t_final)
    op, left, right = f
    if rng.random() < 0.5:
        return (op, _perturb_formula(rng, left, t_final), right)
    return (op, left, _perturb_formula(rng, right, t_final))


# fixed per-family horizon buckets (generator ranges: heat t_final <= 15 s
# at dt 0.05 -> 300 steps; wave <= 2.2 s at dt 0.0025 -> 880) — STATIC jit
# shapes, one compile per family instead of one per (horizon, group size)
from pdec.control.synthesis import FAMILY_BUCKET  # noqa: E402

# max problems per synthesis dispatch: HLO temps scale with
# lanes (= problems x n_starts) x horizon x AD-stored rollout state; wave
# at 1024 problems needs 23 GB HBM (> the 16 GB chip), 256 fits in ~6 GB
from pdec.control.synthesis import FAMILY_DISPATCH  # noqa: E402


def _pad_to(n: int, quantum: int = 256) -> int:
    return max(((n + quantum - 1) // quantum) * quantum, quantum)


def build_dpo_pairs(
    examples: Sequence[GeneratedExample],
    n_candidates: int = 4,
    synthesis: Optional[SynthesisConfig] = None,
    seed: int = 0,
    chain: bool = True,
    n_seeds: int = 1,
    floor_frac: float = 0.05,
) -> List[Dict]:
    """-> reference-schema DPO rows, one per (winner, loser) extreme pair.

    ``chain`` (default): utility = CHAINED two-phase synthesis — optimize
    the candidate subgoal, then re-optimize the ORIGINAL spec with the
    subgoal optimum in the start portfolio (`synthesize` ``init_knots``).
    This is the utility the controller is deployed under (the subgoal
    guides the search; the true objective always gets the final word), so
    preferences trained on it rank subgoals by *how well they steer the
    optimizer*, not by how little they deviate from the spec.  Candidate 0
    (identity) scores exactly the no-controller chained baseline, so every
    surviving pair certifies a subgoal that beats no-intervention.
    ``chain=False`` keeps the round-3 plain definition (synthesize on the
    candidate, score on the original).

    ``n_seeds`` replicates the whole scoring with independent synthesis
    seeds and averages the utilities: multi-start synthesis jitters
    utilities run-to-run, and that label noise — not guidance quality —
    set the round-3 preference noise floor.  Averaging k replicates cuts
    the noise ~sqrt(k), so genuinely-helpful subgoals separate from ties;
    pass a matching lower ``floor_frac`` (see `select_preference`)."""
    rng = random.Random(seed)
    key = jax.random.PRNGKey(seed)

    # 1. flatten (example, candidate) into one synthesis batch per family.
    # Candidate 0 is always the IDENTITY subgoal (the unperturbed spec):
    # without it, every winner is "the least-bad perturbation" and DPO
    # teaches the controller to ALWAYS rewrite the spec — measured on the
    # round-3 sweep as a -2% utility gain vs the no-controller baseline.
    # With identity in the pool, the controller learns to keep the spec
    # unless a perturbation demonstrably helps the true objective.
    flat = []  # (ex_idx, formula)
    for i, ex in enumerate(examples):
        pool = propose_subgoals(
            rng, ex.formula, ex.program.t_final,
            n_candidates=max(n_candidates, 2),
        )
        # fixed slots per example (scoring reshapes assume a rectangular
        # [example, candidate] layout): replicate identity into any slack
        # left after dedup
        while len(pool) < max(n_candidates, 2):
            pool.append(ex.formula)
        for cand in pool:
            flat.append((i, cand))

    # group EXAMPLES by family; each example's system is built once and
    # gathered per candidate on device (the FEM lowering + eig, not the
    # solve, dominated the old per-candidate path: ~0.2 s/system through
    # the device tunnel)
    ex_groups: Dict = {}
    for i, ex in enumerate(examples):
        prog = ex.program
        bucket = FAMILY_BUCKET[prog.kind]
        ex_groups.setdefault((prog.kind, prog.n_elements, bucket), []).append(i)

    utilities = [None] * len(flat)
    times = [None] * len(flat)
    gt_cache = {}  # ex_idx -> compiled GT spec
    for (kind, n_el, bucket), ex_idxs in ex_groups.items():
        # None -> the family's shipped defaults (per-family strides)
        synth_cfg = (synthesis if synthesis is not None
                     else SynthesisConfig.for_family(kind))
        t0 = time.perf_counter()
        sys_ex = problems_from_programs(
            [examples[i].program for i in ex_idxs], max_steps=bucket)
        pos_of_ex = {i: p for p, i in enumerate(ex_idxs)}
        idxs = [j for j, (i, _) in enumerate(flat) if i in pos_of_ex]
        positions, cand_specs, gt_specs = [], [], []
        for j in idxs:
            i, cand = flat[j]
            positions.append(pos_of_ex[i])
            cand_specs.append(compile_spec(cand))
            if i not in gt_cache:
                gt_cache[i] = compile_spec(examples[i].formula)
            gt_specs.append(gt_cache[i])
        # pad to a multiple of the family's dispatch cap (replicating the
        # tail entry): every dispatch shares ONE compiled executable AND
        # stays under the HBM lane budget
        cap = FAMILY_DISPATCH[kind]
        n_real = len(idxs)
        n_pad = _pad_to(n_real, cap)
        positions += [positions[-1]] * (n_pad - n_real)
        cand_specs += [cand_specs[-1]] * (n_pad - n_real)
        gt_specs += [gt_specs[-1]] * (n_pad - n_real)
        cl, pr = stack_specs(cand_specs)
        cl_gt, pr_gt = stack_specs(gt_specs)
        cl, pr = jnp.asarray(cl), jnp.asarray(pr)
        cl_gt, pr_gt = jnp.asarray(cl_gt), jnp.asarray(pr_gt)
        all_scores = []
        for s in range(0, n_pad, cap):
            stacked = take_systems(sys_ex, positions[s:s + cap])
            reps = []
            for rep in range(max(n_seeds, 1)):
                k_rep = jax.random.fold_in(key, 2 * rep)
                res = jax.jit(
                    synthesize_batch, static_argnames=("max_steps", "config")
                )(stacked, cl[s:s + cap], pr[s:s + cap], k_rep,
                  max_steps=bucket, config=synth_cfg)
                if chain:
                    # 2. utility = chained: re-optimize the ORIGINAL spec
                    # with the candidate's optimum in the start portfolio
                    scores = jax.jit(
                        synthesize_batch,
                        static_argnames=("max_steps", "config")
                    )(stacked, cl_gt[s:s + cap], pr_gt[s:s + cap],
                      jax.random.fold_in(key, 2 * rep + 1), max_steps=bucket,
                      config=synth_cfg, init_knots=res.knots).robustness
                else:
                    # 2. utility = achieved robustness on the ORIGINAL spec
                    scores = jax.jit(
                        jax.vmap(evaluate_controls,
                                 in_axes=(0, 0, 0, 0, None, None)),
                        static_argnums=(4, 5),
                    )(stacked, res.controls, cl_gt[s:s + cap],
                      pr_gt[s:s + cap], bucket, synthesis.chunk)
                # ONE device->host transfer per dispatch (per-element
                # float() indexing costs a tunnel round trip each)
                reps.append(np.asarray(scores))
            all_scores.append(np.mean(reps, axis=0))
        scores = np.concatenate(all_scores)
        per = (time.perf_counter() - t0) / max(n_real, 1)
        for k, j in enumerate(idxs):
            utilities[j] = float(scores[k])
            times[j] = per

    return emit_pairs(examples, flat, utilities, times,
                      floor_frac=floor_frac)


def select_preference(utilities: Sequence[float], floor_frac: float = 0.05):
    """Identity-anchored preference selection for ONE example's candidate
    utilities (index 0 = the identity subgoal).  The deployment decision
    the controller faces is "intervene with THIS subgoal or do nothing",
    so preferences anchor at identity:

      - a subgoal that beats identity by more than the noise floor ->
        (subgoal, identity): intervene like this;
      - otherwise, a rewrite that loses to identity by more than the
        floor -> (identity, worst): do not rewrite like that;
      - else None: no informative preference.

    (best, worst) pairs between two non-identity perturbations teach
    neither decision and are never emitted.  The noise floor exists
    because multi-start synthesis jitters utilities by a few percent
    run-to-run; near-tie "preferences" are label noise that measurably
    degrades DPO preference accuracy.
    """
    idxs = list(range(len(utilities)))
    ident = 0
    best = max(idxs, key=lambda j: utilities[j])
    worst = min(idxs, key=lambda j: utilities[j])

    def floor(j):
        return floor_frac * (abs(utilities[j]) + 1.0)

    if best != ident and utilities[best] - utilities[ident] > floor(ident):
        return best, ident
    if utilities[ident] - utilities[worst] > floor(worst):
        return ident, worst
    return None


def emit_pairs(examples, flat, utilities, times,
               floor_frac: float = 0.05) -> List[Dict]:
    """reference-schema rows from scored candidates (see select_preference)."""
    rows: List[Dict] = []
    by_example: Dict[int, List[int]] = {}
    for j, (i, _) in enumerate(flat):
        by_example.setdefault(i, []).append(j)
    for i, idxs in by_example.items():
        pick = select_preference([utilities[j] for j in idxs],
                                 floor_frac=floor_frac)
        if pick is None:
            continue
        w, l = idxs[pick[0]], idxs[pick[1]]
        ex = examples[i]
        rows.append(
            {
                "anchor": ex.nl,
                "w_utility": utilities[w],
                "w_time": times[w],
                "w_sstl": format_sstl_latex(flat[w][1]),
                "l_utility": utilities[l],
                "l_time": times[l],
                "l_sstl": format_sstl_latex(flat[l][1]),
                "dataset_class": ex.meta.get("kind", "heat"),
                "pidx": i,
                "nc": len(formula_clauses(ex.formula)),
                # diagnostics (not consumed by training): which deployment
                # decision this pair teaches, and the utility gap over the
                # identity (no-controller) arm
                "pair_kind": ("intervene" if pick[0] != 0
                              else "keep_identity"),
                "identity_utility": utilities[idxs[0]],
            }
        )
    return rows
