"""Round-2 dissection: where do the 9.4 s of bench.py go, and how fast is
the affine-response objective?

Stages timed (bench config: 2048 heat problems, 320 max_steps, chunk 16):
  A. full synthesize_batch (round-1 final config)     <- should be ~9.4 s
  B. synthesize_batch, polish_iters = 0               <- polish share
  C. synthesize_batch, n_iters=1, polish=0            <- fixed costs (grid
     seed scan + per-start hard evals + argmax plumbing)
  D. spectral objective fwd+bwd, one iteration, all starts
  E. affine precompute (T0, W) per problem
  F. affine objective fwd+bwd, one iteration, all starts
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_batch
from pdec.control.synthesis import SynthesisConfig, synthesize_batch
from pdec.physics.problem import trajectory_times
from pdec.physics.spectral import spectral_trajectory_strided
from pdec.stl.semantics import smooth_robustness

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
MAX_STEPS, CHUNK, STRIDE, STARTS = 320, 16, 4, 6
systems, cl, pr = build_batch(B, MAX_STEPS)
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms   (first call {compile_s:.1f} s)",
          flush=True)
    return r


synth = jax.jit(synthesize_batch, static_argnames=("max_steps", "config"))
timeit("A full synthesize_batch     ", synth, systems, cl, pr, key,
       MAX_STEPS, SynthesisConfig())
timeit("B polish=0                  ", synth, systems, cl, pr, key,
       MAX_STEPS, SynthesisConfig(polish_iters=0))
timeit("C n_iters=1 polish=0        ", synth, systems, cl, pr, key,
       MAX_STEPS, SynthesisConfig(n_iters=1, polish_iters=0))

# D: one spectral-objective fwd+bwd over all (problem, start) instances
n_chunks = MAX_STEPS // CHUNK
theta = jax.random.normal(key, (B, STARTS, n_chunks))


def spectral_obj(theta):
    def per_problem(sys_i, cl_i, pr_i, th_i):
        ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)
        ts_s = ts[::STRIDE]

        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            traj = spectral_trajectory_strided(
                sys_i.spectral, u, sys_i.g0, sys_i.n_out, CHUNK, STRIDE
            )
            return smooth_robustness(traj, ts_s, sys_i.xs, cl_i, pr_i, 5.0)

        return jax.vmap(per_start)(th_i)

    return jnp.sum(jax.vmap(per_problem)(systems, cl, pr, theta))


timeit("D spectral obj fwd+bwd      ",
       jax.jit(jax.grad(spectral_obj)), theta)

# E: affine response precompute: traj(u) = T0 + W @ u (exact for LTI +
# piecewise-constant control)
def affine_ops(sys_i):
    def traj_of(u):
        return spectral_trajectory_strided(
            sys_i.spectral, u, sys_i.g0, sys_i.n_out, CHUNK, STRIDE
        )

    zeros = jnp.zeros((n_chunks,))
    t0 = traj_of(zeros)
    w = jax.jacfwd(traj_of)(zeros)  # [T_out, X+1, n_chunks]
    return t0, w


precompute = jax.jit(jax.vmap(affine_ops))
t0w = timeit("E affine precompute         ", precompute, systems)
T0, W = t0w
print(f"   W shape {W.shape} = {W.size*4/1e6:.0f} MB", flush=True)


def affine_obj(theta, T0, W):
    # T0/W must be ARGUMENTS: closing over 411 MB of concrete arrays bakes
    # them into the HLO as constants (and overflows the tunnel's remote
    # compile request)
    def per_problem(sys_i, t0_i, w_i, cl_i, pr_i, th_i):
        ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)
        ts_s = ts[::STRIDE]

        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            traj = t0_i + jnp.einsum("txc,c->tx", w_i, u)
            return smooth_robustness(traj, ts_s, sys_i.xs, cl_i, pr_i, 5.0)

        return jax.vmap(per_start)(th_i)

    return jnp.sum(
        jax.vmap(per_problem)(systems, T0, W, cl, pr, theta)
    )


timeit("F affine obj fwd+bwd        ",
       jax.jit(jax.grad(affine_obj)), theta, T0, W)

# parity check: affine trajectory == spectral trajectory
def one_traj_spectral(sys_i, th):
    u = sys_i.u_scale * jnp.tanh(th)
    return spectral_trajectory_strided(
        sys_i.spectral, u, sys_i.g0, sys_i.n_out, CHUNK, STRIDE
    )


def one_traj_affine(sys_i, t0_i, w_i, th):
    u = sys_i.u_scale * jnp.tanh(th)
    return t0_i + jnp.einsum("txc,c->tx", w_i, u)


ts_a = jax.jit(jax.vmap(one_traj_affine))(systems, T0, W, theta[:, 0])
ts_s = jax.jit(jax.vmap(one_traj_spectral))(systems, theta[:, 0])
err = float(jnp.max(jnp.abs(ts_a - ts_s)) / (jnp.max(jnp.abs(ts_s)) + 1e-9))
print(f"affine vs spectral max rel err: {err:.2e}", flush=True)
