"""Multi-chip scale-out: fruit-data-parallel execution on a device mesh.

The reference has no distributed execution at all (SURVEY §2.2; no
NCCL/MPI/torch.distributed anywhere in `/root/reference`) — its outer loop
over fruits is sequential Python (`test_wild_completion.py:133`). Fruits are
embarrassingly parallel: the decoder is ~1.8 M params (replicated everywhere;
parameter sharding is never warranted), each fruit's LM solve touches only
its own observation buffers, and the only cross-fruit communication in the
whole pipeline is the final metric reduction.

So the TPU-native scaling story is pure data parallelism over the fruit axis
of the already-vmapped batched solver (`optim/lm.py`):

  * `fruit_mesh(n)` — a 1-D `jax.sharding.Mesh` over all (or n) devices,
    axis name "fruit". Multi-host: ICI within a slice carries nothing but
    the trailing all-gather of results; DCN is never on the hot path.
  * `shard_joint_opt(...)` — `shard_map` of the batched joint optimization:
    each device runs its own `lax.while_loop` over its local fruit lanes,
    so a device whose lanes all converge early exits its loop independently —
    no per-iteration global sync (a pjit-style global `jnp.any` cond would
    all-reduce every LM iteration; shard_map avoids that collective
    entirely).

Padding: the fruit batch is padded to a multiple of the mesh size with
invalid lanes (`frame_valid=False` everywhere) — those lanes fail fast in
the solver (reference per-instance skip semantics, `optimizer.py:139-141`)
and are dropped by the caller.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hortimapping_tpu.config import JointOptConfig
from hortimapping_tpu.models.decoder import DecoderSpec, Params
from hortimapping_tpu.optim.lm import (
    coarse_to_fine_joint_opt,
    shape_pose_joint_opt_batched,
)
from hortimapping_tpu.optim.state import FruitObservations, OptResult


def fruit_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D device mesh over the fruit axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("fruit",))


def init_multi_host(coordinator_address: Optional[str] = None,
                    num_processes: Optional[int] = None,
                    process_id: Optional[int] = None) -> Mesh:
    """Initialize multi-host execution and return the global fruit mesh.

    Multi-host sweeps shard whole datasets over hosts; since fruits never
    communicate, DCN carries nothing but the initial scatter and the final
    metric gather (SURVEY §5: "DCN only for multi-host sweeps"). Arguments
    default to the standard JAX env vars / TPU metadata discovery.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return fruit_mesh()


def pad_to_multiple(
    obs: FruitObservations,
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    multiple: int,
) -> Tuple[FruitObservations, jnp.ndarray, jnp.ndarray, int]:
    """Pad the fruit batch (leading axis) to a multiple of the mesh size.

    Padded lanes carry `frame_valid=False` / `point_valid=False`, so the
    solver marks them failed on the first iteration without doing work.
    Returns (obs, latent0, T_ow0, original_batch_size).
    """
    B = latent0.shape[0]
    rem = (-B) % multiple
    if rem == 0:
        return obs, latent0, T_ow0, B

    def pad(x: jnp.ndarray, invalidate: bool) -> jnp.ndarray:
        pad_block = jnp.zeros((rem,) + x.shape[1:], x.dtype)
        if not invalidate and x.dtype != jnp.bool_:
            # repeat the last real lane so padded math stays well-conditioned
            pad_block = jnp.broadcast_to(x[-1:], (rem,) + x.shape[1:])
        return jnp.concatenate([x, pad_block], axis=0)

    obs_p = FruitObservations(
        T_wc=pad(obs.T_wc, False),
        rays=pad(obs.rays, False),
        ray_valid=pad(obs.ray_valid, True),
        depth_obs=pad(obs.depth_obs, False),
        frame_valid=pad(obs.frame_valid, True),
        points_w=pad(obs.points_w, False),
        point_valid=pad(obs.point_valid, True),
    )
    eye = jnp.broadcast_to(jnp.eye(4, dtype=T_ow0.dtype), (rem, 4, 4))
    return (
        obs_p,
        jnp.concatenate([latent0, jnp.zeros((rem,) + latent0.shape[1:], latent0.dtype)]),
        jnp.concatenate([T_ow0, eye]),
        B,
    )


@lru_cache(maxsize=64)
def _sharded_solver(mesh: Mesh, spec: DecoderSpec, cfg: JointOptConfig,
                    cube_radius: float, pose_known: bool,
                    with_retrieval: bool = False):
    """Build (once per static configuration) the jitted sharded solve.

    The shard_map-wrapped callable MUST be cached: rebuilding it per call
    gives jit a fresh function identity every time, so every served batch
    would retrace + recompile the whole mapped while_loop program (measured
    ~4 s per call on the 8-device dryrun — the dryrun's no-serialize
    assertion is what caught this).

    `with_retrieval` adds a replicated latent-table operand and runs the
    retrieval warm start (optim/warmstart.py) on each device's local lanes
    before its solve — scoring is per-fruit math, so the hot path stays
    collective-free."""
    fruit = P("fruit")
    repl = P()
    obs_specs = FruitObservations(*([fruit] * len(FruitObservations._fields)))

    def _solve(params_, obs_, lat0_, T0_):
        # both phases of the two-resolution solve (and the trust-region
        # while_loop) are per-lane local math — still zero collectives
        from hortimapping_tpu.optim.lm import maybe_pose_polish

        solver = (coarse_to_fine_joint_opt if cfg.coarse_to_fine
                  else shape_pose_joint_opt_batched)
        res = solver(
            params_, spec, cfg, obs_, lat0_, T0_, cube_radius, pose_known
        )
        # the code-frozen pose polish is also per-lane local math
        return maybe_pose_polish(params_, spec, cfg, obs_, res, cube_radius,
                                 pose_known)

    if with_retrieval:

        @jax.jit
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(repl, repl, obs_specs, fruit, fruit),
            out_specs=OptResult(fruit, fruit, fruit, fruit, fruit),
            check_vma=False,
        )
        def _run_retrieval(params_, table_, obs_, lat0_, T0_):
            from hortimapping_tpu.optim.warmstart import maybe_retrieval_init

            lat0_, T0_ = maybe_retrieval_init(
                params_, spec, cfg, table_, obs_, lat0_, T0_
            )
            return _solve(params_, obs_, lat0_, T0_)

        return _run_retrieval

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(repl, obs_specs, fruit, fruit),
        out_specs=OptResult(fruit, fruit, fruit, fruit, fruit),
        check_vma=False,
    )
    def _run(params_, obs_, lat0_, T0_):
        return _solve(params_, obs_, lat0_, T0_)

    return _run


def shard_joint_opt(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    cube_radius: float,
    mesh: Mesh,
    pose_known: bool = False,
    latent_table=None,
) -> OptResult:
    """Run the batched joint shape+pose optimization sharded over `mesh`.

    Observation buffers and initial states are sharded along the leading
    fruit axis; decoder params are replicated. Each device independently
    iterates its local lanes to convergence (zero collectives on the hot
    path). The batch is padded to a mesh multiple; padded lanes come back
    with `failed=True` and are sliced off before returning.

    With `cfg.init_mode == "retrieval"` and a `latent_table` ([N, C],
    replicated), the retrieval warm start runs inside the same sharded
    program on each device's local lanes.
    """
    n_dev = mesh.devices.size
    obs, latent0, T_ow0, B = pad_to_multiple(obs, latent0, T_ow0, n_dev)

    fruit = P("fruit")
    repl = P()
    with_retrieval = cfg.init_mode == "retrieval" and latent_table is not None
    run = _sharded_solver(mesh, spec, cfg, float(cube_radius),
                          bool(pose_known), with_retrieval)

    # place inputs before dispatch so XLA doesn't re-layout inside the map
    sharded = jax.device_put(
        (obs, latent0, T_ow0),
        (
            FruitObservations(*([NamedSharding(mesh, fruit)] * len(obs))),
            NamedSharding(mesh, fruit),
            NamedSharding(mesh, fruit),
        ),
    )
    params_r = jax.device_put(params, NamedSharding(mesh, repl))
    if with_retrieval:
        table_r = jax.device_put(jnp.asarray(latent_table),
                                 NamedSharding(mesh, repl))
        res = run(params_r, table_r, *sharded)
    else:
        res = run(params_r, *sharded)
    return jax.tree_util.tree_map(lambda a: a[:B], res)
