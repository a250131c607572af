"""Two-process `jax.distributed` smoke test of the multi-host path.

`parallel/sharding.init_multi_host` existed since round 2 but was never
exercised across real processes (VERDICT r4 M3): the proven mesh was
single-process with 8 virtual devices. This drives the genuine multi-host
code path on the CPU backend — the same JAX coordination service
(coordinator + gRPC barrier) TPU pods use, minus the ICI fabric:

  parent:  picks a free port, spawns NUM_PROCESSES worker copies of itself,
           requires both to report ok.
  worker:  `init_multi_host(localhost:port, n, i)` -> global 4-device fruit
           mesh (2 local CPU devices per process via
           --xla_force_host_platform_device_count=2), then ONE sharded
           joint shape+pose solve step (`shard_joint_opt`, the production
           entry) on 4 deterministic synthetic fruits and a cross-process
           fetch of the per-lane failed flags.

Input placement note (the multi-host contract): every process builds the
SAME full fruit batch (deterministic seeds) and `jax.device_put` against
the global NamedSharding keeps each process's local shards — the
fully-replicated-host-data path. A production sweep would instead build
only local fruits and assemble with `jax.make_array_from_process_local_data`;
either way the solve program is identical and collective-free (SURVEY §5:
DCN carries nothing but the final gather).

    python tools/multihost_smoke.py            # parent, ~1-2 min on CPU
    (exit 0 = both workers green)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NUM_PROCESSES = 2
LOCAL_DEVICES = 2
MARKER = "MULTIHOST_SMOKE_OK "


def worker(port: int, process_id: int) -> None:
    import jax

    # the axon sitecustomize force-sets jax_platforms at interpreter start;
    # the config update (not the env var) is what wins (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hortimapping_tpu.config import JointOptConfig
    from hortimapping_tpu.models.workspace import config_decoder
    from hortimapping_tpu.parallel.sharding import init_multi_host, shard_joint_opt
    from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

    mesh = init_multi_host(f"localhost:{port}", NUM_PROCESSES, process_id)
    n_global = NUM_PROCESSES * LOCAL_DEVICES
    assert jax.process_count() == NUM_PROCESSES, jax.process_count()
    assert jax.device_count() == n_global, jax.device_count()
    assert jax.local_device_count() == LOCAL_DEVICES
    assert mesh.devices.size == n_global

    params, spec = config_decoder(os.path.join(ROOT, "assets", "synthetic_small_8"))
    cfg = JointOptConfig(
        n_fg_pix=32, n_bg_pix=32, n_frame=2, n_sample_on_ray=16,
        recon_n_pts=32, max_iter=2, lm_lambda_0=0.5,
    )
    cat = SyntheticCategory(spec=spec)
    obs_list, lat_list, T_list = [], [], []
    for b in range(n_global):  # one fruit lane per global device
        rng = np.random.default_rng(100 + b)
        code = (rng.normal(size=spec.code_length) * 0.4).astype(np.float32)
        obs, _ = make_scene(cat, code, np.eye(4, dtype=np.float32),
                            n_frames=cfg.n_frame, n_fg=cfg.n_fg_pix,
                            n_bg=cfg.n_bg_pix, n_points=cfg.recon_n_pts,
                            seed=100 + b)
        obs_list.append(obs)
        lat_list.append(np.zeros(spec.code_length, np.float32))
        T_list.append(np.eye(4, dtype=np.float32))
    obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)

    res = shard_joint_opt(
        params, spec, cfg, obs, jnp.stack(lat_list), jnp.stack(T_list),
        cube_radius=0.1, mesh=mesh,
    )
    jax.block_until_ready(res)
    assert res.latent.shape == (n_global, spec.code_length)
    # each process holds exactly its local lanes of the global result
    assert len(res.latent.addressable_shards) == LOCAL_DEVICES

    # cross-process fetch: replicate the per-lane flags onto every process
    # (the "final metric gather" of a real sweep), then read host-side
    gather = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    failed = np.asarray(jax.device_get(gather(res.failed)))
    iters = np.asarray(jax.device_get(gather(res.iter_count)))
    assert failed.shape == (n_global,) and not failed.any(), failed
    assert (iters >= 1).all()

    print(MARKER + json.dumps({
        "process_id": process_id,
        "processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "failed": failed.tolist(),
        "iters": iters.tolist(),
    }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.port, args.worker)
        return 0

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--port", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(NUM_PROCESSES)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = True
    for i, (p, out) in enumerate(zip(procs, outs)):
        good = p.returncode == 0 and MARKER in out
        print(f"worker {i}: rc={p.returncode} "
              f"{'ok' if good else 'FAIL'}")
        if not good:
            ok = False
            print(out[-4000:])
        else:
            print("  " + [l for l in out.splitlines() if MARKER in l][0])
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
