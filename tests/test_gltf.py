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


def test_sparse_accessor_decode(tmp_path):
    """glTF 2.0 sparse accessors (§3.6.2.3): indices select rows of the
    base view (zeros when bufferView is absent) that values overwrite —
    the decode loaders.gl gives the reference (loader.ts:13-17)."""
    import base64
    import json
    import struct

    base = [(float(i), 0.0, 0.0) for i in range(5)]
    sparse_idx = [1, 3]
    sparse_val = [(9.0, 9.0, 9.0), (7.0, 7.0, 7.0)]
    buf = b"".join(struct.pack("<3f", *p) for p in base)  # 60 B
    buf += struct.pack("<2H", *sparse_idx)  # 4 B
    buf += b"".join(struct.pack("<3f", *v) for v in sparse_val)  # 24 B
    gltf = {
        "asset": {"version": "2.0"},
        "accessors": [
            {  # sparse overlay on a dense base view
                "bufferView": 0, "componentType": 5126, "count": 5,
                "type": "VEC3",
                "sparse": {
                    "count": 2,
                    "indices": {"bufferView": 1, "componentType": 5123},
                    "values": {"bufferView": 2},
                },
            },
            {  # sparse with NO base view: zeros + overlay
                "componentType": 5126, "count": 5, "type": "VEC3",
                "sparse": {
                    "count": 2,
                    "indices": {"bufferView": 1, "componentType": 5123},
                    "values": {"bufferView": 2},
                },
            },
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 60},
            {"buffer": 0, "byteOffset": 60, "byteLength": 4},
            {"buffer": 0, "byteOffset": 64, "byteLength": 24},
        ],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
    }
    p = tmp_path / "sparse.gltf"
    p.write_text(json.dumps(gltf))
    f = GLTFFile.load(str(p))
    got = f.accessor(0)
    expect = np.asarray(base, np.float32)
    expect[1] = (9, 9, 9)
    expect[3] = (7, 7, 7)
    np.testing.assert_array_equal(got, expect)
    got_zero = f.accessor(1)
    expect_zero = np.zeros((5, 3), np.float32)
    expect_zero[1] = (9, 9, 9)
    expect_zero[3] = (7, 7, 7)
    np.testing.assert_array_equal(got_zero, expect_zero)


def _spot_scene_gltf(tmp_path):
    """Minimal .gltf: one floor quad + a KHR spot light 2 units above it
    pointing straight down (node rotation turns (0,0,-1) into (0,-1,0))."""
    import base64
    import json
    import struct

    pos = [(-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)]
    nrm = [(0, 1, 0)] * 4
    idx = [0, 2, 1, 0, 3, 2]  # CCW seen from above (+Y geometric normal)
    buf = b"".join(struct.pack("<3f", *p) for p in pos)
    buf += b"".join(struct.pack("<3f", *n) for n in nrm)
    buf += struct.pack("<6H", *idx) + b"\0\0"  # pad to 4
    gltf = {
        "asset": {"version": "2.0"},
        "extensionsUsed": ["KHR_lights_punctual"],
        "extensions": {"KHR_lights_punctual": {"lights": [{
            # Spots inherit the point-light pdf quirk (1/N * 10000,
            # pt.wgsl:438), so visible intensities are Blender-scale.
            "type": "spot", "color": [1.0, 0.5, 0.25], "intensity": 40000.0,
            "spot": {"innerConeAngle": 0.2, "outerConeAngle": 0.5},
        }]}},
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0},
            {  # -90 deg about X: local -Z maps to world -Y
                "translation": [0.0, 2.0, 0.0],
                "rotation": [-0.7071068, 0.0, 0.0, 0.7071068],
                "extensions": {"KHR_lights_punctual": {"light": 0}},
            },
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1}, "indices": 2,
        }]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3", "min": [-1, 0, -1], "max": [1, 0, 1]},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 12},
        ],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
    }
    p = tmp_path / "spot.gltf"
    p.write_text(json.dumps(gltf))
    return str(p)


def test_spot_light_parity_skip(tmp_path):
    import warnings as W

    path = _spot_scene_gltf(tmp_path)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        s = load_model(path)  # default: reference parity (gpu.ts:234-236)
    assert s.num_lights == 0
    assert any("Unsupported light type: spot" in str(w.message) for w in rec)


def test_spot_light_extension_parse(tmp_path):
    s = load_model(_spot_scene_gltf(tmp_path), enable_spot_lights=True)
    assert s.num_lights == 1
    assert s.light_type[0] == 3
    np.testing.assert_allclose(s.light_position[0], [0, 2, 0], atol=1e-5)
    np.testing.assert_allclose(s.light_color[0], [1.0, 0.5, 0.25])
    assert s.light_intensity[0] == 40000.0
    np.testing.assert_allclose(s.light_aux[0, 0:3], [0, -1, 0], atol=1e-5)
    cos_i, cos_o = np.cos(0.2), np.cos(0.5)
    scale = 1.0 / (cos_i - cos_o)
    np.testing.assert_allclose(s.light_aux[0, 3], scale, rtol=1e-5)
    np.testing.assert_allclose(s.light_aux[0, 4], -cos_o * scale, rtol=1e-5)


def test_spot_light_render_cone(tmp_path):
    """Rendered spot pool: lit inside the cone, dark outside, smooth edge."""
    from wgpu_path_tracing_tpu import Renderer, RenderConfig

    r = Renderer(RenderConfig(width=32, height=32, frames_per_chunk=4,
                              spot_lights=True))
    r.load_model(_spot_scene_gltf(tmp_path))
    # Look straight down at the floor from above.
    r.camera.position = np.asarray([0.0, 1.0, 0.0], np.float32)
    r.camera.rotate(0.0, -np.pi / 2 * 0.98)
    buf = r.render(spp=16)
    img = np.asarray(buf)  # (H, W, 3) linear
    c = img[16, 16].mean()  # cone center: tan(0.5)*2 ≈ 1.09 > view extent
    corner = img[1, 1].mean()
    assert c > 0.01, f"spot center unlit: {c}"
    # The corner pixel views the floor at ~0.9 units out, angle atan(0.9/2)
    # ≈ 0.42 rad — inside the outer cone but dimmer than the axis.
    assert c > corner, (c, corner)


def test_external_sidecar_uris(tmp_path):
    """.gltf sidecar layout: external .bin buffers AND external image
    files resolve relative to the document, with percent-decoded uris —
    the layouts loaders.gl accepts (loader.ts:13-17). Images referenced
    by missing files degrade to None (untextured), not a crash."""
    import json
    import struct

    buf = struct.pack("<3f", 1.0, 2.0, 3.0)
    (tmp_path / "mesh data.bin").write_bytes(buf)
    png = bytes.fromhex("89504e470d0a1a0a") + b"not-a-real-png-body"
    (tmp_path / "tex image.png").write_bytes(png)
    gltf = {
        "asset": {"version": "2.0"},
        "accessors": [{
            "bufferView": 0, "componentType": 5126, "count": 1,
            "type": "VEC3",
        }],
        "bufferViews": [{"buffer": 0, "byteOffset": 0,
                         "byteLength": len(buf)}],
        "buffers": [{"byteLength": len(buf), "uri": "mesh%20data.bin"}],
        "images": [{"uri": "tex%20image.png"},
                   {"uri": "missing.png"}],
    }
    p = tmp_path / "sidecar.gltf"
    p.write_text(json.dumps(gltf))
    f = GLTFFile.load(str(p))
    np.testing.assert_array_equal(
        f.accessor(0), np.asarray([[1.0, 2.0, 3.0]], np.float32))
    assert f.image_bytes(0) == png
    assert f.image_bytes(1) is None
