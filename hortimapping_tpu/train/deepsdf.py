"""DeepSDF decoder training on TPU.

The reference repository ships its decoders pretrained
(`deepsdf/models/*/specs.json` + `ModelParameters/latest.pth`) and contains
NO training code — the `specs.json` training fields (SamplesPerScene,
ScenesPerBatch, LearningRateSchedule, CodeRegularization*, ...) are
leftovers of the upstream torch DeepSDF trainer that users must fetch
separately. This module is a TPU-native trainer for the SAME experiment-dir
convention, so a trained run drops straight into the completion pipelines:

  <experiment>/specs.json                 — arch + training hyperparameters
  <data_source>/SdfSamples/<name>.npz     — per-scene samples, keys
                                            "pos"/"neg", each [N, 4] (xyz, sdf)
                                            (the upstream preprocessing format)
  -> <experiment>/native/<ckpt>.npz       — folded weights + latent-code
                                            table (models/workspace.py)

TPU-first design (vs the upstream per-scene DataLoader + worker threads):

  * the whole sample bank is device-resident: one padded [S, N_cap, 4]
    tensor per sign with validity masks — fruit-scale categories (hundreds
    of scenes x tens of k samples) are a few hundred MB, far below HBM;
  * a training step draws ScenesPerBatch scenes and SamplesPerScene
    samples per scene with on-device RNG (uniform with replacement over the
    valid prefix — the upstream random-chunk subsampling has the same
    stationary distribution), then runs the clamped-L1 DeepSDF objective
    plus code regularization:
        L = |clamp(f(z_s, x)) - clamp(sdf)|_1 + lambda * min(1, e/100) |z|^2
  * network and latent-code table are two Adam groups with the two
    LearningRateSchedule entries from specs.json (step decay
    initial * factor^(epoch/interval));
  * `lax.scan` over the steps of an epoch inside one jit — no host round
    trips except the per-epoch log line.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hortimapping_tpu.models.decoder import DecoderSpec, Params, decoder_apply, init_decoder_params
from hortimapping_tpu.models.workspace import NATIVE_SUBDIR, load_specs, save_native_checkpoint

TRAIN_STATE_FILE = "train_state.npz"


def _train_state_path(experiment_directory: str) -> str:
    return os.path.join(experiment_directory, NATIVE_SUBDIR, TRAIN_STATE_FILE)


def _save_train_state(experiment_directory: str, carry, epoch: int,
                      losses: Sequence[float]) -> str:
    """Persist the FULL training carry (params, latent codes, both Adam
    states, RNG key) plus the epoch counter and loss history, atomically.

    The carry is stored as its flattened leaves: `train_deepsdf` rebuilds an
    identical pytree structure from specs.json on resume, so leaf order is
    deterministic and no treedef serialization is needed. Written via a
    temp file + rename so a kill mid-write never corrupts the last good
    snapshot."""
    import jax

    leaves = jax.tree_util.tree_leaves(carry)
    arrays = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["epoch"] = np.asarray(int(epoch), np.int64)
    arrays["losses"] = np.asarray(losses, np.float64)
    path = _train_state_path(experiment_directory)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # np.savez appends ".npz" to names that lack it — keep the suffix LAST
    tmp = path[: -len(".npz")] + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return path


def _load_train_state(experiment_directory: str, carry_template):
    """-> (carry, epoch, losses) with every leaf restored exactly (dtypes
    included: f32 weights/moments, i32 Adam step counts, u32 RNG key)."""
    import jax
    import jax.numpy as jnp

    path = _train_state_path(experiment_directory)
    structure = jax.tree_util.tree_structure(carry_template)
    template_leaves = jax.tree_util.tree_leaves(carry_template)
    with np.load(path) as z:
        keys = sorted(k for k in z.files if k.startswith("leaf_"))
        if len(keys) != len(template_leaves):
            raise ValueError(
                f"{path} holds {len(keys)} leaves but the experiment's "
                f"training state has {len(template_leaves)} — specs.json or "
                "the dataset changed since the snapshot; delete it to "
                "restart from scratch")
        leaves = [jnp.asarray(z[k]) for k in keys]
        for saved, tmpl in zip(leaves, template_leaves):
            if saved.shape != tmpl.shape:
                raise ValueError(
                    f"{path} leaf shape {saved.shape} != expected "
                    f"{tmpl.shape} — specs.json or the dataset changed "
                    "since the snapshot; delete it to restart from scratch")
        epoch = int(z["epoch"])
        losses = [float(x) for x in z["losses"]]
    return jax.tree_util.tree_unflatten(structure, leaves), epoch, losses


def _split_names(split: Optional[object]) -> Optional[List[str]]:
    """Flatten a DeepSDF split description (nested dict dataset->class->[ids]
    or a plain list) into instance names."""
    if split is None:
        return None
    if isinstance(split, (list, tuple)):
        return list(split)
    names: List[str] = []
    for classes in split.values():
        for ids in classes.values():
            names.extend(ids)
    return names


def load_sdf_samples(
    data_source: str,
    split: Optional[object] = None,
    n_cap: int = 16384,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Load SdfSamples/*.npz into padded device-ready banks.

    Returns (pos [S, n_cap, 4], pos_n [S], neg [S, n_cap, 4], neg_n [S],
    names). Scenes with more than n_cap samples of a sign are subsampled
    once on host (training then resamples on device every step).
    """
    rng = rng or np.random.default_rng(0)
    root = os.path.join(data_source, "SdfSamples")
    names = _split_names(split)
    if names is None:
        names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(root) if f.endswith(".npz")
        )
    S = len(names)
    if S == 0:
        raise FileNotFoundError(f"no SdfSamples .npz under {root}")
    pos = np.zeros((S, n_cap, 4), np.float32)
    neg = np.zeros((S, n_cap, 4), np.float32)
    pos_n = np.zeros(S, np.int32)
    neg_n = np.zeros(S, np.int32)
    for s, name in enumerate(names):
        with np.load(os.path.join(root, name + ".npz")) as z:
            for key, bank, count in (("pos", pos, pos_n), ("neg", neg, neg_n)):
                a = np.asarray(z[key], np.float32).reshape(-1, 4)
                if a.shape[0] > n_cap:
                    a = a[rng.choice(a.shape[0], n_cap, replace=False)]
                bank[s, : a.shape[0]] = a
                count[s] = a.shape[0]
    return pos, pos_n, neg, neg_n, names


@dataclasses.dataclass
class TrainResult:
    params: Params
    latent_codes: np.ndarray         # [S, C]
    losses: np.ndarray               # per-epoch mean loss
    names: List[str]
    checkpoint_path: Optional[str] = None
    # wall_s (whole loop incl. compile), steady_wall_s/steady_epochs
    # (excluding the first chunk = compile + warmup), steps_per_epoch
    timing: Optional[Dict] = None


def _lr_schedule(entry: Dict, default_initial: float) -> Tuple[float, float, float]:
    """(initial, factor, interval) of a DeepSDF 'Step' LearningRateSchedule."""
    if not entry:
        return default_initial, 0.5, 500.0
    return (
        float(entry.get("Initial", default_initial)),
        float(entry.get("Factor", 0.5)),
        float(entry.get("Interval", 500)),
    )


def train_deepsdf(
    experiment_directory: str,
    data_source: Optional[str] = None,
    split: Optional[object] = None,
    num_epochs: Optional[int] = None,
    seed: int = 0,
    save: bool = True,
    checkpoint: str = "latest",
    mesh=None,
    epochs_per_call: int = 25,
    snapshot_every: Optional[int] = None,
    resume: bool = False,
    log=print,
) -> TrainResult:
    """Train a DeepSDF decoder + latent table from an experiment directory.

    Reads arch and hyperparameters from `<experiment>/specs.json`
    (CodeLength / NetworkSpecs / ClampingDistance exactly as the inference
    loader, plus the upstream training fields with their upstream defaults),
    trains on `<data_source>/SdfSamples`, and writes the native checkpoint
    + latent-code table consumed by `models.workspace.config_decoder` and
    `load_latent_vectors`.

    With `mesh` (a 1-D `jax.sharding.Mesh`, e.g. `parallel.fruit_mesh()`),
    training is data-parallel over the mesh: each device draws its share of
    the scene batch (device-folded RNG), gradients are `pmean`-reduced, and
    the identical optimizer update runs replicated — decoder (~1.8 M params)
    and sample banks are replicated, which is the right sharding at fruit
    scale (parameter sharding is never warranted; SURVEY.md section 5,
    distributed backend).

    `snapshot_every=N` persists, every N epochs: (a) the inference
    checkpoint `<experiment>/native/<checkpoint>.npz` (so pipelines can use
    the in-progress decoder — the upstream trainer's rolling "latest.pth"
    convention) and (b) the full training state
    (`<experiment>/native/train_state.npz`: params, codes, both Adam
    states, RNG key, epoch, loss history — written atomically).
    `resume=True` restores that state exactly — the continued run is
    bit-identical to an uninterrupted one (tested,
    test_train.py::test_snapshot_resume_is_bit_identical).
    """
    import jax
    import jax.numpy as jnp
    import optax

    specs = load_specs(experiment_directory)
    spec = DecoderSpec.from_specs_json(specs)
    data_source = data_source or specs.get("DataSource")
    if data_source is None:
        raise ValueError("data_source not given and specs.json has no DataSource")
    if split is None and specs.get("TrainSplit") and os.path.isfile(str(specs["TrainSplit"])):
        with open(specs["TrainSplit"]) as f:
            split = json.load(f)

    scenes_per_batch = int(specs.get("ScenesPerBatch", 64))
    samples_per_scene = int(specs.get("SamplesPerScene", 8192))
    num_epochs = int(num_epochs or specs.get("NumEpochs", 500))
    clamp = float(specs.get("ClampingDistance", 0.1))
    code_reg = bool(specs.get("CodeRegularization", True))
    code_reg_lambda = float(specs.get("CodeRegularizationLambda", 1e-4))
    code_init_std = float(specs.get("CodeInitStdDev", 0.01))
    code_bound = specs.get("CodeBound")
    sched = specs.get("LearningRateSchedule", [])
    net_lr0, net_f, net_iv = _lr_schedule(sched[0] if len(sched) > 0 else {}, 5e-4)
    cod_lr0, cod_f, cod_iv = _lr_schedule(sched[1] if len(sched) > 1 else {}, 1e-3)

    pos, pos_n, neg, neg_n, names = load_sdf_samples(data_source, split)
    S = len(names)
    scenes_per_batch = min(scenes_per_batch, S)
    steps_per_epoch = max(1, S // scenes_per_batch)
    half = samples_per_scene // 2
    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    # per-device share of the global scene batch, rounded UP: flooring would
    # silently shrink the effective ScenesPerBatch (e.g. 64 on 6 devices
    # trained with 60), changing hyperparameters vs specs.json
    scenes_local = max(1, -(-scenes_per_batch // n_shards))
    if mesh is not None and scenes_local * n_shards != scenes_per_batch:
        print(
            f"[train] ScenesPerBatch={scenes_per_batch} is not divisible by "
            f"{n_shards} devices; rounding the global scene batch up to "
            f"{scenes_local * n_shards}"
        )

    key = jax.random.PRNGKey(seed)
    params = init_decoder_params(spec, key)
    codes0 = jnp.asarray(
        np.random.default_rng(seed).normal(size=(S, spec.code_length)) * code_init_std,
        jnp.float32,
    )

    pos_d, neg_d = jnp.asarray(pos), jnp.asarray(neg)
    pos_nd, neg_nd = jnp.asarray(pos_n), jnp.asarray(neg_n)

    net_opt = optax.adam(1.0)   # lr applied manually per step (step-decay)
    cod_opt = optax.adam(1.0)
    net_state = net_opt.init(params)
    cod_state = cod_opt.init(codes0)

    def scene_batch(k, scene_ids, banks):
        """Per-step sample draw: half pos, half neg per scene (upstream
        balance), uniform over each scene's valid prefix. `banks` are
        TRACED arguments (threaded through chunk_fn), never closed over:
        a closure would bake them into the jitted HLO as constants —
        268 MB at 512 scenes — which the axon remote-compile endpoint
        rejects (HTTP 413) and which bloats any AOT cache."""
        pos_b, pos_nb, neg_b, neg_nb = banks
        kp, kn = jax.random.split(k)

        def draw(bank, counts, kk):
            idx = jax.random.randint(kk, (scenes_local, half), 0, 1 << 30)
            idx = idx % jnp.maximum(counts[scene_ids], 1)[:, None]
            return jax.vmap(lambda b, i: b[i])(bank[scene_ids], idx)

        return jnp.concatenate(
            [draw(pos_b, pos_nb, kp), draw(neg_b, neg_nb, kn)], axis=1
        )  # [B_local, samples_per_scene(~), 4]

    def epoch_fn(carry, epoch, banks):
        params, codes, net_state, cod_state, k = carry
        net_lr = net_lr0 * net_f ** jnp.floor(epoch / net_iv)
        cod_lr = cod_lr0 * cod_f ** jnp.floor(epoch / cod_iv)
        reg_ramp = jnp.minimum(1.0, (epoch + 1.0) / 100.0)  # upstream warmup

        def step_fn(carry, step_key):
            params, codes, net_state, cod_state = carry
            if mesh is not None:
                # each device draws its own scenes; everything else replicated
                step_key = jax.random.fold_in(step_key, jax.lax.axis_index("fruit"))
            ks, kd = jax.random.split(step_key)
            scene_ids = jax.random.randint(ks, (scenes_local,), 0, S)
            samples = scene_batch(kd, scene_ids, banks)     # [B, n, 4]
            xyz, sdf_gt = samples[..., :3], samples[..., 3]
            sdf_gt = jnp.clip(sdf_gt, -clamp, clamp)

            def loss_fn(params, codes):
                z = codes[scene_ids]                         # [B, C]
                zb = jnp.broadcast_to(z[:, None, :], xyz.shape[:2] + (spec.code_length,))
                inp = jnp.concatenate([zb, xyz], axis=-1)
                pred = decoder_apply(params, spec, inp)[..., 0]
                # straight-through clamp: the VALUE is the upstream loss
                # |clamp(pred) - clamp(gt)| exactly, but the gradient treats
                # the clamp as identity. A hard clip has zero gradient
                # outside +-clamp, and with Adam's normalized per-coordinate
                # steps the mean prediction overshoots the band within ~10
                # steps at reference scale (8x512 net, He init) — after
                # which EVERY gradient is exactly 0 and the run is dead
                # (measured: 1000 epochs pinned at loss 0.076, round 4).
                # Straight-through keeps the restoring pull on wrong-side
                # saturated predictions; right-side-saturated ones still get
                # no gradient (|clamp(pred)-clamp(gt)| = 0 there), matching
                # the upstream semantics of not supervising outside the band.
                pred = pred + jax.lax.stop_gradient(
                    jnp.clip(pred, -clamp, clamp) - pred)
                data = jnp.mean(jnp.abs(pred - sdf_gt))
                reg = 0.0
                if code_reg:
                    reg = code_reg_lambda * reg_ramp * jnp.mean(jnp.sum(z * z, axis=-1))
                return data + reg

            loss, (g_par, g_cod) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, codes)
            if mesh is not None:
                # the only collective: mean-reduce grads (and the logged
                # loss) over the data axis; the replicated update keeps
                # every device's params/codes/optimizer state in lockstep
                g_par, g_cod, loss = jax.lax.pmean((g_par, g_cod, loss), "fruit")
            up, net_state2 = net_opt.update(g_par, net_state)
            params = optax.apply_updates(params, jax.tree_util.tree_map(lambda u: net_lr * u, up))
            upc, cod_state2 = cod_opt.update(g_cod, cod_state)
            codes = optax.apply_updates(codes, jax.tree_util.tree_map(lambda u: cod_lr * u, upc))
            if code_bound is not None:
                norm = jnp.linalg.norm(codes, axis=-1, keepdims=True)
                codes = codes * jnp.minimum(1.0, float(code_bound) / jnp.maximum(norm, 1e-12))
            return (params, codes, net_state2, cod_state2), loss

        k, ke = jax.random.split(k)
        (params, codes, net_state, cod_state), losses = jax.lax.scan(
            step_fn, (params, codes, net_state, cod_state),
            jax.random.split(ke, steps_per_epoch),
        )
        return (params, codes, net_state, cod_state, k), jnp.mean(losses)

    def chunk_fn(carry, epoch_ids, *banks):
        # scan whole epochs per dispatch: over the axon tunnel each
        # dispatch + loss fetch costs ~0.3-1 s of host round trips, which
        # dominated per-epoch stepping (measured: 40 one-step epochs took
        # 47 s dispatched singly, ~2.3 s chunked — docs/PERF.md round 4)
        return jax.lax.scan(lambda c, e: epoch_fn(c, e, banks),
                            carry, epoch_ids)

    if mesh is None:
        run_chunk = jax.jit(chunk_fn)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        # all state replicated; per-device divergence comes only from the
        # axis_index-folded RNG inside step_fn, and pmean re-syncs gradients
        run_chunk = jax.jit(shard_map(
            chunk_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()), out_specs=(P(), P()),
            check_vma=False,
        ))
    carry = (params, codes0, net_state, cod_state, key)
    losses: list = []
    e = 0
    if resume and os.path.isfile(_train_state_path(experiment_directory)):
        carry, e, losses = _load_train_state(experiment_directory, carry)
        log(f"resumed at epoch {e}/{num_epochs} from "
            f"{_train_state_path(experiment_directory)}")
    epochs_per_call = max(1, min(int(epochs_per_call), num_epochs))
    t0 = time.time()
    t_first = None  # end of the first chunk = compile + one chunk of work
    e_start = e     # resume offset: only num_epochs - e_start epochs run
    first_chunk_n = 0  # actual first-chunk length (snapshot_every can cut it)

    def snapshot():
        save_native_checkpoint(experiment_directory, checkpoint, carry[0],
                               spec, latent_codes=np.asarray(carry[1]))
        _save_train_state(experiment_directory, carry, e, losses)

    while e < num_epochs:
        n = min(epochs_per_call, num_epochs - e)
        if snapshot_every:
            # land chunk ends exactly on snapshot boundaries so a resumed
            # run replays the same chunking (bit-identical continuation)
            n = min(n, snapshot_every - e % snapshot_every)
        carry, chunk_losses = run_chunk(
            carry, jnp.arange(e, e + n, dtype=jnp.float32),
            pos_d, pos_nd, neg_d, neg_nd)
        losses.extend(np.asarray(chunk_losses).tolist())
        if t_first is None:
            t_first = time.time()
            first_chunk_n = n
        e += n
        log(f"epoch {e:4d}/{num_epochs}  loss {losses[-1]:.5f}  "
            f"({time.time() - t0:.1f}s)")
        if snapshot_every and e % snapshot_every == 0 and e < num_epochs:
            snapshot()
    params, codes = carry[0], carry[1]
    timing = {
        "wall_s": time.time() - t0,
        # steady-state excludes the first chunk (jit compile + warmup);
        # meaningful only when more than one chunk ran. Uses the ACTUAL
        # first-chunk length and resume offset: snapshot_every can truncate
        # the first chunk, and resume=True starts mid-run — assuming
        # num_epochs - epochs_per_call miscounts both (advisor round 4)
        "steady_wall_s": (time.time() - t_first) if t_first else 0.0,
        "steady_epochs": max(0, (num_epochs - e_start) - first_chunk_n),
        "steps_per_epoch": steps_per_epoch,
    }

    path = None
    if save:
        path = save_native_checkpoint(
            experiment_directory, checkpoint, params, spec,
            latent_codes=np.asarray(codes),
        )
        if snapshot_every:
            # keep the training state current too, so a later resume with a
            # larger num_epochs extends this run instead of restarting
            _save_train_state(experiment_directory, carry, e, losses)
        log(f"saved {path}")
    return TrainResult(params, np.asarray(codes), np.asarray(losses), names,
                       path, timing)
