"""TPU-native DeepSDF trainer (hortimapping_tpu/train/deepsdf.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from hortimapping_tpu.models.decoder import DecoderSpec, decoder_sdf
from hortimapping_tpu.models.workspace import config_decoder, load_latent_vectors
from hortimapping_tpu.train import load_sdf_samples, train_deepsdf


def _make_dataset(root, n_scenes=6, n_pos=3000, n_neg=3000, seed=0):
    """SdfSamples from analytic spheres of differing radii — ground truth is
    exact, so the trained decoder + per-scene codes must reproduce the radii."""
    os.makedirs(os.path.join(root, "SdfSamples"), exist_ok=True)
    rng = np.random.default_rng(seed)
    radii = 0.05 + 0.03 * rng.random(n_scenes)
    for s in range(n_scenes):
        r = radii[s]
        pts = rng.normal(size=(n_pos + n_neg, 3))
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
        pts *= r * (1.0 + rng.normal(size=(n_pos + n_neg, 1)) * 0.3)
        sdf = np.linalg.norm(pts, axis=-1) - r
        samples = np.concatenate([pts, sdf[:, None]], axis=-1).astype(np.float32)
        np.savez(
            os.path.join(root, "SdfSamples", f"sphere_{s:02d}.npz"),
            pos=samples[sdf >= 0], neg=samples[sdf < 0],
        )
    return radii


def _make_experiment(root, data_source):
    os.makedirs(root, exist_ok=True)
    specs = {
        "Description": "test spheres",
        "DataSource": data_source,
        "CodeLength": 4,
        "NetworkSpecs": {"dims": [48, 48, 48], "latent_in": [1],
                         "dropout": [], "dropout_prob": 0.0,
                         "norm_layers": [], "latent_dropout": False,
                         "weight_norm": True, "xyz_in_all": False,
                         "use_tanh": False},
        "ClampingDistance": 0.1,
        "NumEpochs": 60,
        "ScenesPerBatch": 6,
        "SamplesPerScene": 1024,
        "CodeRegularization": True,
        "CodeRegularizationLambda": 1e-4,
        "CodeInitStdDev": 0.01,
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 2e-3, "Interval": 30, "Factor": 0.5},
            {"Type": "Step", "Initial": 5e-3, "Interval": 30, "Factor": 0.5},
        ],
    }
    with open(os.path.join(root, "specs.json"), "w") as f:
        json.dump(specs, f)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    data = str(tmp_path_factory.mktemp("sdf_data"))
    exp = str(tmp_path_factory.mktemp("experiment"))
    radii = _make_dataset(data)
    _make_experiment(exp, data)
    res = train_deepsdf(exp, log=lambda *a: None)
    return exp, radii, res


def test_loader_shapes(tmp_path):
    radii = _make_dataset(str(tmp_path), n_scenes=3)
    pos, pos_n, neg, neg_n, names = load_sdf_samples(str(tmp_path))
    assert pos.shape[0] == 3 and pos.shape[2] == 4
    assert len(names) == 3
    assert (pos_n > 0).all() and (neg_n > 0).all()
    # padded region is zero
    assert pos[0, pos_n[0]:].sum() == 0.0


def test_training_converges(trained):
    _, _, res = trained
    assert res.losses[-1] < 0.4 * res.losses[0], (
        f"loss did not drop: {res.losses[0]:.4f} -> {res.losses[-1]:.4f}")
    assert res.latent_codes.shape == (6, 4)


def test_checkpoint_roundtrip_and_fit(trained):
    """The saved experiment is directly consumable by the inference loaders,
    and the learned (decoder, code) pairs reproduce each sphere's surface."""
    exp, radii, res = trained
    params, spec = config_decoder(exp)
    codes = load_latent_vectors(exp)
    assert codes.shape == (6, spec.code_length)

    dirs = np.random.default_rng(1).normal(size=(200, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    errs = []
    for s, r in enumerate(radii):
        pts = jnp.asarray((dirs * r).astype(np.float32))
        sdf = np.asarray(decoder_sdf(params, spec, codes[s], pts))
        errs.append(np.abs(sdf).mean())
    # surface SDF within a few mm on 5-8 cm spheres
    assert np.mean(errs) < 0.008, f"surface errors {np.round(errs, 4)}"


def test_training_survives_clamp_overshoot(tmp_path):
    """Straight-through clamp regression (round 4): with a hard
    `clip(pred)` in the loss, Adam's normalized steps push the mean
    prediction past +-ClampingDistance within ~10 steps at reference scale,
    after which every gradient is exactly 0 and the run is dead (measured:
    1000 epochs pinned at loss 0.076). The straight-through clamp keeps the
    restoring pull on wrong-side-saturated predictions. Reproduce the
    overshoot at tiny scale with an aggressive LR: training must still
    recover and converge instead of pinning at a constant."""
    data = str(tmp_path / "data")
    exp = str(tmp_path / "exp")
    _make_dataset(data, n_scenes=6)
    _make_experiment(exp, data)
    with open(os.path.join(exp, "specs.json")) as f:
        specs = json.load(f)
    # ~10x the tuned LR: guarantees the band overshoot the full-scale run
    # hit organically (pred saturates within the first epochs)
    specs["LearningRateSchedule"] = [
        {"Type": "Step", "Initial": 2e-2, "Interval": 30, "Factor": 0.5},
        {"Type": "Step", "Initial": 5e-2, "Interval": 30, "Factor": 0.5},
    ]
    with open(os.path.join(exp, "specs.json"), "w") as f:
        json.dump(specs, f)
    res = train_deepsdf(exp, save=False, log=lambda *a: None)
    losses = np.asarray(res.losses)
    assert np.isfinite(losses).all()
    # a clamp-dead run pins at a constant; a live one keeps improving
    assert losses[-10:].mean() < 0.5 * losses[:5].mean(), (
        f"training died after overshoot: {losses[:5]} -> {losses[-10:]}")


def test_snapshot_resume_is_bit_identical(tmp_path):
    """Crash recovery: `snapshot_every` persists the full training state
    mid-run (params, codes, both Adam states, RNG key, loss history) and
    `resume=True` continues from it — the resumed run must be BIT-identical
    to an uninterrupted one, not merely close."""
    data = str(tmp_path / "data")
    _make_dataset(data, n_scenes=6)
    exp_a = str(tmp_path / "exp_straight")
    exp_b = str(tmp_path / "exp_resumed")
    _make_experiment(exp_a, data)
    _make_experiment(exp_b, data)

    res_a = train_deepsdf(exp_a, num_epochs=10, save=False,
                          log=lambda *a: None)

    # leg 1: snapshots at epoch 5; save=False so the only state on disk is
    # the MID-RUN snapshot — i.e. a crash between epochs 5 and 10
    train_deepsdf(exp_b, num_epochs=10, save=False, snapshot_every=5,
                  log=lambda *a: None)
    # the rolling inference checkpoint written at the snapshot must be a
    # valid experiment-dir checkpoint on its own
    params_mid, spec_mid = config_decoder(exp_b)
    assert spec_mid.code_length == 4
    assert len(jax.tree_util.tree_leaves(params_mid)) > 0
    codes_mid = load_latent_vectors(exp_b)
    assert codes_mid.shape == (6, 4)

    # leg 2: resume from epoch 5 and run to 10
    res_b = train_deepsdf(exp_b, num_epochs=10, save=False, resume=True,
                          log=lambda *a: None)

    np.testing.assert_array_equal(np.asarray(res_a.losses),
                                  np.asarray(res_b.losses))
    np.testing.assert_array_equal(res_a.latent_codes, res_b.latent_codes)
    for la, lb in zip(jax.tree_util.tree_leaves(res_a.params),
                      jax.tree_util.tree_leaves(res_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_resume_rejects_mismatched_experiment(tmp_path):
    """A stale train_state from a DIFFERENT architecture must be refused
    with a clear error, not silently loaded into the wrong pytree."""
    data = str(tmp_path / "data")
    _make_dataset(data, n_scenes=6)
    exp = str(tmp_path / "exp")
    _make_experiment(exp, data)
    # num_epochs > snapshot_every so a MID-RUN snapshot lands on disk
    train_deepsdf(exp, num_epochs=8, save=False, snapshot_every=5,
                  log=lambda *a: None)
    from hortimapping_tpu.train.deepsdf import _train_state_path
    assert os.path.isfile(_train_state_path(exp))
    # grow the architecture under the same experiment dir
    with open(os.path.join(exp, "specs.json")) as f:
        specs = json.load(f)
    specs["NetworkSpecs"]["dims"] = [48, 48, 48, 48]
    with open(os.path.join(exp, "specs.json"), "w") as f:
        json.dump(specs, f)
    with pytest.raises(ValueError, match="specs.json or the dataset changed"):
        train_deepsdf(exp, num_epochs=10, save=False, resume=True,
                      log=lambda *a: None)


def test_training_data_parallel_mesh(tmp_path):
    """Data-parallel training over the 8-device mesh: gradients pmean-sync,
    state stays replicated, loss converges like the single-device run."""
    from hortimapping_tpu.parallel import fruit_mesh

    data = str(tmp_path / "data")
    exp = str(tmp_path / "exp")
    _make_dataset(data, n_scenes=6)
    _make_experiment(exp, data)
    res = train_deepsdf(exp, num_epochs=40, mesh=fruit_mesh(8), save=False,
                        log=lambda *a: None)
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < 0.5 * res.losses[0], (
        f"DP loss did not drop: {res.losses[0]:.4f} -> {res.losses[-1]:.4f}")


def test_timing_steady_epochs_counts_actual_first_chunk(tmp_path):
    """steady_epochs must subtract the ACTUAL first-chunk length (advisor
    round 4): snapshot_every can truncate the first chunk below
    epochs_per_call, and a resumed run starts mid-run — the old
    num_epochs - epochs_per_call formula miscounted both."""
    data = str(tmp_path / "data")
    _make_dataset(data, n_scenes=6)

    # fresh run, snapshot_every truncates the first chunk to 5 epochs:
    # 10 total - 5 first-chunk = 5 steady (old formula: max(0, 10-25) = 0)
    exp_a = str(tmp_path / "exp_snap")
    _make_experiment(exp_a, data)
    res_a = train_deepsdf(exp_a, num_epochs=10, save=False, snapshot_every=5,
                          log=lambda *a: None)
    assert res_a.timing["steady_epochs"] == 5

    # resumed run: only epochs 5..10 execute and they all land in the
    # resumed run's FIRST chunk -> 0 steady epochs
    res_b = train_deepsdf(exp_a, num_epochs=10, save=False, resume=True,
                          log=lambda *a: None)
    assert res_b.timing["steady_epochs"] == 0

    # plain multi-chunk run: 10 total, epochs_per_call=4 -> first chunk 4,
    # steady 6
    exp_c = str(tmp_path / "exp_chunks")
    _make_experiment(exp_c, data)
    res_c = train_deepsdf(exp_c, num_epochs=10, save=False, epochs_per_call=4,
                          log=lambda *a: None)
    assert res_c.timing["steady_epochs"] == 6
