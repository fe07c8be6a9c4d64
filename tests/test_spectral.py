"""Spectral rollout accuracy vs the direct scan, heat and wave."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.physics.problem import problem_from_program
from pdec.physics.rollout import (
    precompute_chunk_operators,
    rollout_trajectory_chunked,
)
from pdec.physics.spectral import spectral_ops, spectral_trajectory_strided
from pdec.stl.program import parse_fem_program

from tests.test_stl_parse import HEAT_PROGRAM, WAVE_PROGRAM
from tests.test_wave_synthesis import WAVE_PROGRAM as SMALL_WAVE

CHUNK, STRIDE = 16, 4


@pytest.mark.parametrize("source,max_steps", [
    (HEAT_PROGRAM, 192), (WAVE_PROGRAM, 800), (SMALL_WAVE, 256),
])
def test_spectral_matches_direct(source, max_steps):
    prog = parse_fem_program(source)
    sys_ = problem_from_program(prog, max_steps=max_steps)
    n_chunks = max_steps // CHUNK
    controls = jnp.sin(jnp.arange(n_chunks) * 0.7) * float(sys_.u_scale) * 0.5

    ops_d = precompute_chunk_operators(sys_.a_d, sys_.b_d, sys_.c_d, CHUNK)
    direct = rollout_trajectory_chunked(
        *ops_d, sys_.x0, controls, sys_.g0, sys_.n_out
    )
    direct_strided = direct[::STRIDE]

    ops_s = spectral_ops(sys_.a_d, sys_.b_d, sys_.c_d, sys_.x0)
    spectral = spectral_trajectory_strided(
        ops_s, controls, sys_.g0, sys_.n_out, CHUNK, STRIDE
    )
    assert spectral.shape == direct_strided.shape
    scale = float(jnp.max(jnp.abs(direct_strided)) + 1e-6)
    err = float(jnp.max(jnp.abs(spectral - direct_strided))) / scale
    assert err < 2e-3, f"spectral relative error {err}"


def test_spectral_gradients_flow():
    prog = parse_fem_program(HEAT_PROGRAM)
    sys_ = problem_from_program(prog, max_steps=192)
    ops_s = spectral_ops(sys_.a_d, sys_.b_d, sys_.c_d, sys_.x0)

    def loss(u):
        traj = spectral_trajectory_strided(
            ops_s, u, sys_.g0, sys_.n_out, CHUNK, STRIDE
        )
        return jnp.sum(traj**2)

    g = jax.grad(loss)(jnp.zeros((192 // CHUNK,)))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0
