"""Validation against the reference's REAL mounted artifacts.

The decoder weights (`ModelParameters/latest.pth`) are absent from the mount
(`/root/reference/.MISSING_LARGE_BLOBS`), but `specs.json` and the trained
latent-code tables (`LatentCodes/latest.pth`, torch format) ARE present —
these tests exercise our loaders on the genuine files, not synthetic stand-ins
(reference loader semantics: `deepsdf/deep_sdf/workspace.py:82-114,203-225`).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from hortimapping_tpu.models.decoder import DecoderSpec
from hortimapping_tpu.models.workspace import load_latent_vectors, load_specs

REF_MODELS = "/root/reference/deepsdf/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MODELS), reason="reference mount not available"
)

# (category, latent table rows, clamping distance) — table sizes per
# SURVEY.md §2 #2; clamping per each category's specs.json
CATEGORIES = [
    ("sweetpepper_32", 919, 0.1),
    ("strawberry_32", 879, 0.05),
]


@pytest.mark.parametrize("cat,n_codes,clamp", CATEGORIES)
def test_real_specs_json_parses(cat, n_codes, clamp):
    spec = DecoderSpec.from_specs_json(load_specs(os.path.join(REF_MODELS, cat)))
    assert spec.code_length == 32
    assert spec.dims == (512,) * 8
    assert spec.latent_in == (4,)
    assert spec.clamping_distance == pytest.approx(clamp)


@pytest.mark.parametrize("cat,n_codes,clamp", CATEGORIES)
def test_real_latent_tables_load(cat, n_codes, clamp):
    """The torch-format branch of load_latent_vectors on the real .pth files
    (both categories ship the raw-tensor layout, ref workspace.py:96-114)."""
    lat = load_latent_vectors(os.path.join(REF_MODELS, cat))
    assert lat.shape == (n_codes, 32)
    assert lat.dtype == np.float32
    arr = np.asarray(lat)
    assert np.isfinite(arr).all()
    # trained DeepSDF codes are small but not degenerate
    norms = np.linalg.norm(arr, axis=1)
    assert 0.01 < float(np.median(norms)) < 10.0
    # mean-code init (test_wild_completion.py:46-47) must be finite and small
    mean = arr.mean(axis=0)
    assert np.isfinite(mean).all() and float(np.abs(mean).max()) < 1.0


def test_real_latent_table_matches_reference_loader():
    """Head-to-head with the genuine reference loader
    (`deepsdf/deep_sdf/workspace.py:82-114`)."""
    from tests import reference_shim as rs

    rs.install()
    from deepsdf.deep_sdf.workspace import load_latent_vectors as ref_load

    for cat, _, _ in CATEGORIES:
        exp_dir = os.path.join(REF_MODELS, cat)
        ref = ref_load(exp_dir, "latest").detach().cpu().numpy()
        mine = np.asarray(load_latent_vectors(exp_dir))
        np.testing.assert_array_equal(mine, ref.astype(np.float32))
