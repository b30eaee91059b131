"""GLB/GLTF ingestion tests against the reference's sample scenes
(public/models/*.glb) and the gpu.ts material/transform semantics."""

import os

import numpy as np
import pytest

from wgpu_path_tracing_tpu.models.gltf import (
    GLTFFile,
    _build_material,
    _node_local_matrix,
    load_model,
    potpack,
)

MODELS = "/root/reference/public/models"
requires_models = pytest.mark.skipif(
    not os.path.exists(MODELS), reason="reference models absent"
)


@requires_models
@pytest.mark.parametrize(
    "name,min_tris",
    [("cornell2", 500), ("monkey", 500), ("metal", 1000),
     ("glass_box", 5000), ("transform", 30), ("untitled", 1000)],
)
def test_reference_models_load(name, min_tris):
    s = load_model(f"{MODELS}/{name}.glb")
    assert s.num_triangles >= min_tris
    assert s.num_materials >= 1
    assert s.num_lights >= 1  # all sample scenes have emissive geometry
    # Geometry sane
    assert np.isfinite(s.tri_v0).all()
    norms = np.linalg.norm(s.tri_n0, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # Emissive lights reference valid (post-reorder) triangles whose
    # material is actually emissive (gpu.ts:121-138).
    emissive = s.light_type == 0
    tri_idx = s.light_tri[emissive]
    assert (tri_idx >= 0).all() and (tri_idx < s.num_triangles).all()
    mats = s.tri_mat[tri_idx]
    assert (np.linalg.norm(s.mat_emission[mats], axis=1) > 0).all()


@requires_models
def test_glass_box_transmission_and_ior():
    s = load_model(f"{MODELS}/glass_box.glb")
    assert (s.mat_transmission > 0).any(), "KHR_materials_transmission parsed"
    assert np.isfinite(s.mat_ior).all() and (s.mat_ior > 0).all()


def test_material_defaults_without_material():
    m = _build_material(None, None)
    # gpu.ts:362-376: no material -> metallic 0, roughness 0.1
    assert m["metallic"] == 0.0 and m["roughness"] == 0.1
    assert m["ior"] == 1.5 and m["transmission"] == 0.0
    assert m["emissive_strength"] == 0.0


def test_material_defaults_with_empty_material():
    m = _build_material({}, None)
    # gpu.ts:378-391: with a material, factors default to 1.0
    assert m["metallic"] == 1.0 and m["roughness"] == 1.0
    assert m["emissive_strength"] == 1.0
    assert m["base_color"] == [1.0, 1.0, 1.0]


def test_material_khr_extensions():
    m = _build_material(
        {
            "pbrMetallicRoughness": {"baseColorFactor": [0.5, 0.25, 1.0, 1.0],
                                     "metallicFactor": 0.3},
            "emissiveFactor": [1.0, 2.0, 3.0],
            "extensions": {
                "KHR_materials_emissive_strength": {"emissiveStrength": 7.5},
                "KHR_materials_ior": {"ior": 1.31},
                "KHR_materials_transmission": {"transmissionFactor": 0.9},
            },
        },
        None,
    )
    assert m["base_color"] == [0.5, 0.25, 1.0]
    assert m["metallic"] == 0.3 and m["roughness"] == 1.0
    assert m["emission"] == [1.0, 2.0, 3.0] and m["emissive_strength"] == 7.5
    assert m["ior"] == 1.31 and m["transmission"] == 0.9


def test_node_trs_order():
    # T * R * S with column vectors (gpu.ts:152-192): scale applies first.
    node = {
        "translation": [1.0, 0.0, 0.0],
        "rotation": [0.0, 0.0, 0.7071068, 0.7071068],  # 90° about +Z
        "scale": [2.0, 1.0, 1.0],
    }
    m = _node_local_matrix(node)
    p = m @ np.array([1.0, 0.0, 0.0, 1.0])
    # scale: (2,0,0); rotate 90° about z: (0,2,0); translate: (1,2,0)
    np.testing.assert_allclose(p[:3], [1.0, 2.0, 0.0], atol=1e-6)


def test_node_matrix_column_major():
    # glTF matrices are column-major: translation lives in elements 12-14.
    node = {"matrix": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 5, 6, 7, 1]}
    m = _node_local_matrix(node)
    np.testing.assert_allclose(m[0:3, 3], [5, 6, 7])


@requires_models
def test_transform_glb_world_matrices():
    # transform.glb exercises nested node transforms; all triangles must
    # land at finite world positions within a sane bound.
    s = load_model(f"{MODELS}/transform.glb")
    allv = np.concatenate([s.tri_v0, s.tri_v1, s.tri_v2])
    assert np.isfinite(allv).all()
    assert np.abs(allv).max() < 1e4


def test_potpack_no_overlap_and_containment():
    rng = np.random.default_rng(0)
    boxes = [{"w": int(rng.integers(4, 64)), "h": int(rng.integers(4, 64)),
              "x": 0, "y": 0} for _ in range(40)]
    w, h = potpack(boxes)
    for b in boxes:
        assert b["x"] >= 0 and b["y"] >= 0
        assert b["x"] + b["w"] <= w and b["y"] + b["h"] <= h
    for i, a in enumerate(boxes):
        for b in boxes[i + 1:]:
            overlap = not (
                a["x"] + a["w"] <= b["x"] or b["x"] + b["w"] <= a["x"]
                or a["y"] + a["h"] <= b["y"] or b["y"] + b["h"] <= a["y"]
            )
            assert not overlap, f"boxes {a} and {b} overlap"


def test_glb_parser_rejects_bad_magic(tmp_path):
    bad = tmp_path / "bad.glb"
    # Not a GLB, not valid JSON glTF either.
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(Exception):
        GLTFFile.load(str(bad))
