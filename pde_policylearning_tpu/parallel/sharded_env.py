"""Spatially-sharded channel-DNS stepping over the device mesh.

reference: the survey's distributed-spectral hints (neuralop/mpu/
helpers.py:66-81 `_transpose` all_to_all and the conj-symmetric pad_helper)
gesture at a distributed FFT path the reference never finished.

TPU-native version: the env state is sharded along the periodic x axis
over the 'model' mesh axis and the UNCHANGED `rk3_step` runs under jit
with sharding annotations — XLA SPMD turns the x-rolls into ppermute halo
exchanges and re-lays out the FFT axes (all_to_all) automatically.  No
bespoke communication code, and gradients (for differentiable-physics
training through the env) shard the same way.

Constraint: XLA's SPMD distributed FFT requires the per-partition size of
the transformed axis to be divisible by the partition count, i.e. an
x-sharding degree <= sqrt(Nx) (e.g. <=4 for the 32-point channel; larger
meshes put the remaining axes on 'data'/batch).
"""
from __future__ import annotations

from functools import partial
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..envs import channel_flow as cf
from .mesh import DATA_AXIS, MODEL_AXIS


def shard_env_state(mesh: Mesh, state: cf.ChannelState) -> cf.ChannelState:
    """Place U/V/W with the x axis sharded over the 'model' mesh axis."""
    xsh = NamedSharding(mesh, P(MODEL_AXIS))
    repl = NamedSharding(mesh, P())
    return cf.ChannelState(
        U=jax.device_put(state.U, xsh),
        V=jax.device_put(state.V, xsh),
        W=jax.device_put(state.W, xsh),
        dPdx=jax.device_put(state.dPdx, repl),
        meanU0=jax.device_put(state.meanU0, repl),
    )


def sharded_step(mesh: Mesh, grid: cf.ChannelGrid, state: cf.ChannelState,
                 opV1, opV2) -> cf.ChannelState:
    """One RK3 step with the state constrained to x-sharding; the actuation
    planes shard on their x axis too."""
    xsh2 = NamedSharding(mesh, P(MODEL_AXIS))

    @jax.jit
    def step(state, opV1, opV2):
        state = cf.rk3_step(grid, state, opV1, opV2)
        return cf.ChannelState(
            U=jax.lax.with_sharding_constraint(state.U, xsh2),
            V=jax.lax.with_sharding_constraint(state.V, xsh2),
            W=jax.lax.with_sharding_constraint(state.W, xsh2),
            dPdx=state.dPdx, meanU0=state.meanU0)

    with cf.force_unfused_poisson():
        return step(state, jax.device_put(opV1, xsh2),
                    jax.device_put(opV2, xsh2))


def sharded_rollout(mesh: Mesh, grid: cf.ChannelGrid,
                    state: cf.ChannelState, n_steps: int,
                    detect_plane: int = 25):
    """Opposition-control rollout with x-sharded state (see impl)."""
    with cf.force_unfused_poisson():
        return _sharded_rollout_impl(mesh, grid, state, n_steps,
                                     detect_plane)


@partial(jax.jit, static_argnames=("mesh", "n_steps", "detect_plane"))
def _sharded_rollout_impl(mesh: Mesh, grid: cf.ChannelGrid,
                          state: cf.ChannelState, n_steps: int,
                          detect_plane: int = 25):
    """Opposition-control rollout with x-sharded state; the sharding
    constraint inside the scan body keeps XLA from gathering the state
    between steps."""
    xsh = NamedSharding(mesh, P(MODEL_AXIS))

    def body(carry, _):
        st = carry
        opV1, opV2 = cf.gt_control(st, detect_plane)
        st = cf.rk3_step(grid, st, opV1, opV2)
        st = cf.ChannelState(
            U=jax.lax.with_sharding_constraint(st.U, xsh),
            V=jax.lax.with_sharding_constraint(st.V, xsh),
            W=jax.lax.with_sharding_constraint(st.W, xsh),
            dPdx=st.dPdx, meanU0=st.meanU0)
        _, p2 = cf.boundary_pressures(grid, st)
        return st, p2

    return jax.lax.scan(body, state, None, length=n_steps)


# ---------------------------------------------------------------------------
# Data-parallel multi-env rollout: one (or more) independent environments
# per device over the 'data' mesh axis.  This is the throughput multiplier
# for data collection on a pod: the envs never communicate, so aggregate
# steps/s scales linearly with chips (unlike single-chip vmap, which this
# backend batches anti-linearly — NOTES_r2).
#
# All sharded entry points trace under channel_flow.force_unfused_poisson:
# the fused pallas_call is opaque to GSPMD and would replicate instead of
# splitting over the batch/x axis.
# ---------------------------------------------------------------------------

def shard_env_batch(mesh: Mesh, states: cf.ChannelState) -> cf.ChannelState:
    """Place a batched ChannelState (leading env axis on every leaf) with
    the env axis sharded over the 'data' mesh axis."""
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, bsh), states)


def data_parallel_rollout(mesh: Mesh, grid: cf.ChannelGrid,
                          states: cf.ChannelState, n_steps: int,
                          detect_plane: int = 25, policy: str = "gt",
                          collect_fields: bool = False):
    """`channel_flow.batched_rollout` with the env batch sharded over
    'data'; sharding constraints inside keep every per-env computation
    local to its device (zero collectives in the stepping loop)."""
    bsh = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, static_argnames=("n_steps", "detect_plane", "policy",
                                       "collect_fields"))
    def run(states, n_steps, detect_plane, policy, collect_fields):
        states = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, bsh), states)
        return cf.batched_rollout(grid, states, n_steps,
                                  detect_plane=detect_plane, policy=policy,
                                  collect_fields=collect_fields)
    with cf.force_unfused_poisson():
        return run(shard_env_batch(mesh, states), n_steps, detect_plane,
                   policy, collect_fields)
