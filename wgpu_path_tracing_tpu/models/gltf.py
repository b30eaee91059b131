"""GLB/GLTF scene ingestion (host-side, NumPy).

Replaces the reference's loaders.gl parse + scene flatten + atlas pipeline
(loader.ts:13-46 -> gpu.ts:67-150 -> atlas.ts:32-184) with a self-contained
parser. Semantics mirrored from the reference:

* world matrices via parent-chain walk over ALL nodes in the file, not just
  scene roots (gpu.ts:77-103); local matrix = node.matrix if present, else
  T·R·S (gpu.ts:152-192),
* KHR_lights_punctual: directional lights store the world-rotated (0,0,-1)
  direction in ``position`` (gpu.ts:209-221); point lights the world origin
  (gpu.ts:222-233); other types warn and are skipped (gpu.ts:234-236),
* mesh primitives: positions transformed by the world matrix, normals by
  the transposed-inverse upper 3x3 then normalized (gpu.ts:247-274);
  non-indexed primitives raise (gpu.ts:307-309 throws 'No index found');
  missing TEXCOORD_0 becomes all-zero UVs (gpu.ts:310),
* one material entry per primitive, duplicates included (gpu.ts:285-291),
* material defaults exactly as buildMaterial (gpu.ts:358-421): WITH a
  material, metallicFactor defaults to 1.0 and roughnessFactor to 1.0;
  WITHOUT one, metallic 0.0 / roughness 0.1; ior 1.5, transmission 0,
  emissive strength 1.0 via the KHR extensions,
* texture atlas (atlas.ts): 4 slots per material, 0.5x downscale
  (TEXTURE_PIXEL_RATIO, atlas.ts:10), potpack bin packing, atlas rounded up
  to a power-of-two square (atlas.ts:64-67), albedo sRGB->linear with gamma
  2.2 THROUGH AN 8-BIT ROUND TRIP (the reference does the pow on canvas
  bytes, atlas.ts:143-149), other slots copied linearly; texels are
  byte/255 floats (the rgba16float canvas upload),
* BVH build + in-place triangle reorder + post-reorder emissive light
  extraction via models/assemble.py (gpu.ts:119-138).
"""

from __future__ import annotations

import base64
import io
import json
import math
import os
import struct
import warnings

import numpy as np

from wgpu_path_tracing_tpu.accel.native import flatten_native, native_available
from wgpu_path_tracing_tpu.models.assemble import finalize_scene
from wgpu_path_tracing_tpu.models.types import SceneArrays

GLB_MAGIC = 0x46546C67
CHUNK_JSON = 0x4E4F534A
CHUNK_BIN = 0x004E4942

_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_NUM_COMPONENTS = {
    "SCALAR": 1,
    "VEC2": 2,
    "VEC3": 3,
    "VEC4": 4,
    "MAT2": 4,
    "MAT3": 9,
    "MAT4": 16,
}


class GLTFFile:
    """Parsed glTF document with binary buffers resolved."""

    def __init__(self, gltf: dict, buffers: list[bytes],
                 base_dir: str = ""):
        self.gltf = gltf
        self.buffers = buffers
        # Directory of the source file — external image uris (.gltf
        # sidecar textures) resolve against it, like loaders.gl's
        # baseUri (the reference parses any gltf layout, loader.ts:13-17).
        self.base_dir = base_dir

    @classmethod
    def load(cls, path: str) -> "GLTFFile":
        with open(path, "rb") as f:
            data = f.read()
        if len(data) >= 12 and struct.unpack_from("<I", data, 0)[0] == GLB_MAGIC:
            return cls._parse_glb(data, os.path.dirname(path))
        gltf = json.loads(data)
        base_dir = os.path.dirname(path)
        return cls(gltf, cls._load_buffers(gltf, None, base_dir), base_dir)

    @classmethod
    def _parse_glb(cls, data: bytes, base_dir: str) -> "GLTFFile":
        magic, version, _length = struct.unpack_from("<III", data, 0)
        assert magic == GLB_MAGIC
        if version != 2:
            raise ValueError(f"Unsupported GLB version {version}")
        offset = 12
        gltf = None
        bin_chunk = b""
        while offset + 8 <= len(data):
            chunk_len, chunk_type = struct.unpack_from("<II", data, offset)
            offset += 8
            chunk = data[offset : offset + chunk_len]
            offset += chunk_len
            if chunk_type == CHUNK_JSON:
                gltf = json.loads(chunk)
            elif chunk_type == CHUNK_BIN:
                bin_chunk = chunk
        if gltf is None:
            raise ValueError("GLB has no JSON chunk")
        return cls(gltf, cls._load_buffers(gltf, bin_chunk, base_dir),
                   base_dir)

    @staticmethod
    def _load_buffers(gltf: dict, glb_bin: bytes | None, base_dir: str):
        buffers = []
        for buf in gltf.get("buffers", []):
            uri = buf.get("uri")
            if uri is None:
                buffers.append(glb_bin or b"")
            elif uri.startswith("data:"):
                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                from urllib.parse import unquote

                with open(os.path.join(base_dir, unquote(uri)), "rb") as f:
                    buffers.append(f.read())
        return buffers

    def _read_view(self, view_idx: int, extra_offset: int, count: int,
                   n: int, dtype: np.dtype) -> np.ndarray:
        """Read (count, n) elements of ``dtype`` from a bufferView,
        honoring its byteStride (interleaved views)."""
        bv = self.gltf["bufferViews"][view_idx]
        buf = self.buffers[bv.get("buffer", 0)]
        offset = bv.get("byteOffset", 0) + extra_offset
        stride = bv.get("byteStride") or dtype.itemsize * n
        return np.ndarray(
            shape=(count, n),
            dtype=dtype,
            buffer=buf,
            offset=offset,
            strides=(stride, dtype.itemsize),
        ).copy()

    def accessor(self, idx: int) -> np.ndarray:
        """Read accessor ``idx`` as a (count, n) array. Interleaved,
        normalized, and sparse accessors are all decoded — the same
        ingestion surface the reference gets from loaders.gl
        (loader.ts:13-17). Sparse substitution (glTF 2.0 §3.6.2.3:
        ``indices`` select rows of the base view — zeros when absent —
        that ``values`` overwrite) happens before normalization."""
        acc = self.gltf["accessors"][idx]
        n = _NUM_COMPONENTS[acc["type"]]
        dtype = np.dtype(_COMPONENT_DTYPES[acc["componentType"]])
        count = acc["count"]
        if "bufferView" in acc:
            arr = self._read_view(
                acc["bufferView"], acc.get("byteOffset", 0), count, n, dtype
            )
        else:
            arr = np.zeros((count, n), dtype)
        if "sparse" in acc:
            sp = acc["sparse"]
            sidx = sp["indices"]
            idx_dtype = np.dtype(_COMPONENT_DTYPES[sidx["componentType"]])
            rows = self._read_view(
                sidx["bufferView"], sidx.get("byteOffset", 0),
                sp["count"], 1, idx_dtype,
            ).reshape(-1).astype(np.int64)
            vals = self._read_view(
                sp["values"]["bufferView"],
                sp["values"].get("byteOffset", 0),
                sp["count"], n, dtype,
            )
            arr[rows] = vals
        if acc.get("normalized"):
            if dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            elif dtype == np.uint16:
                arr = arr.astype(np.float32) / 65535.0
            elif dtype == np.int8:
                arr = np.maximum(arr.astype(np.float32) / 127.0, -1.0)
            elif dtype == np.int16:
                arr = np.maximum(arr.astype(np.float32) / 32767.0, -1.0)
        return arr

    def image_bytes(self, image_idx: int) -> bytes | None:
        img = self.gltf["images"][image_idx]
        if "bufferView" in img:
            bv = self.gltf["bufferViews"][img["bufferView"]]
            buf = self.buffers[bv.get("buffer", 0)]
            off = bv.get("byteOffset", 0)
            return buf[off : off + bv["byteLength"]]
        uri = img.get("uri")
        if uri and uri.startswith("data:"):
            return base64.b64decode(uri.split(",", 1)[1])
        if uri:
            # External sidecar image (.gltf + .png/.jpg layout); uris are
            # percent-encoded per the glTF spec (loaders.gl decodes them).
            from urllib.parse import unquote

            path = os.path.join(self.base_dir, unquote(uri))
            if os.path.exists(path):
                with open(path, "rb") as f:
                    return f.read()
        return None


# --- transforms (gpu.ts:152-192 semantics, column-vector convention) ---------


def _quat_to_mat3(q) -> np.ndarray:
    x, y, z, w = (float(v) for v in q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float64,
    )


def _mat3_to_quat(m: np.ndarray):
    """Rotation quaternion from a matrix, trace method (as wgpu-matrix
    quat.fromMat — assumes the upper 3x3 is a rotation; scaled matrices
    misbehave identically to the reference)."""
    trace = m[0, 0] + m[1, 1] + m[2, 2]
    if trace > 0.0:
        root = math.sqrt(trace + 1.0)
        w = 0.5 * root
        root = 0.5 / root
        return np.array(
            [
                (m[2, 1] - m[1, 2]) * root,
                (m[0, 2] - m[2, 0]) * root,
                (m[1, 0] - m[0, 1]) * root,
                w,
            ]
        )
    i = 0
    if m[1, 1] > m[0, 0]:
        i = 1
    if m[2, 2] > m[i, i]:
        i = 2
    j = (i + 1) % 3
    k = (i + 2) % 3
    root = math.sqrt(m[i, i] - m[j, j] - m[k, k] + 1.0)
    q = np.zeros(4)
    q[i] = 0.5 * root
    root = 0.5 / root
    q[3] = (m[k, j] - m[j, k]) * root
    q[j] = (m[j, i] + m[i, j]) * root
    q[k] = (m[k, i] + m[i, k]) * root
    return q


def _node_local_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        # glTF matrices are column-major.
        return np.asarray(node["matrix"], np.float64).reshape(4, 4, order="F")
    m = np.eye(4)
    if "translation" in node:
        t = np.eye(4)
        t[0:3, 3] = node["translation"]
        m = m @ t
    if "rotation" in node:
        r = np.eye(4)
        r[0:3, 0:3] = _quat_to_mat3(node["rotation"])
        m = m @ r
    if "scale" in node:
        s = np.diag(list(node["scale"]) + [1.0])
        m = m @ s
    return m


def _world_matrices(gltf: dict) -> list[np.ndarray]:
    """Parent-chain walk over all nodes (gpu.ts:77-103)."""
    nodes = gltf.get("nodes", [])
    parent = {}
    for i, node in enumerate(nodes):
        for child in node.get("children", []):
            parent[child] = i
    out = []
    for i, node in enumerate(nodes):
        world = _node_local_matrix(node)
        cur = i
        while cur in parent:
            cur = parent[cur]
            world = _node_local_matrix(nodes[cur]) @ world
        out.append(world)
    return out


# --- texture atlas (atlas.ts semantics) ----------------------------------------


def potpack(boxes: list[dict]) -> tuple[int, int]:
    """Bin packing as in the mapbox/potpack algorithm the reference uses
    (atlas.ts:60). Dispatches to the native C++ twin
    (accel/cbvh/potpack.cpp) when it compiles, else the Python packer;
    both are bit-identical (tests/test_potpack_native.py). Mutates each
    box's x/y. Returns (width, height)."""
    from wgpu_path_tracing_tpu.accel.native import native_available, potpack_native

    if boxes and native_available():
        wh = np.array([[b["w"], b["h"]] for b in boxes], np.float64)
        xy, w, h = potpack_native(wh)
        # The Python packer keeps int arithmetic when every dim is int
        # (the fat atlas's LCM grids feed np.empty shapes downstream) —
        # the f64 math is exact there, so only the TYPE needs restoring.
        as_int = all(
            isinstance(b["w"], int) and isinstance(b["h"], int) for b in boxes
        )
        for b, (x, y) in zip(boxes, xy):
            b["x"] = int(x) if as_int else float(x)
            b["y"] = int(y) if as_int else float(y)
        return (int(w), int(h)) if as_int else (w, h)
    return potpack_python(boxes)


def potpack_python(boxes: list[dict]) -> tuple[int, int]:
    """The pure-Python packer: sort by height, fill a ~square strip, split
    free spaces. The bit-identity reference for the native twin."""
    area = sum(b["w"] * b["h"] for b in boxes)
    max_width = max((b["w"] for b in boxes), default=0)
    order = sorted(range(len(boxes)), key=lambda i: -boxes[i]["h"])
    start_width = max(math.ceil(math.sqrt(area / 0.95)), max_width)
    spaces = [{"x": 0, "y": 0, "w": start_width, "h": float("inf")}]
    width = height = 0
    for bi in order:
        box = boxes[bi]
        for i in range(len(spaces) - 1, -1, -1):
            space = spaces[i]
            if box["w"] > space["w"] or box["h"] > space["h"]:
                continue
            box["x"] = space["x"]
            box["y"] = space["y"]
            height = max(height, box["y"] + box["h"])
            width = max(width, box["x"] + box["w"])
            if box["w"] == space["w"] and box["h"] == space["h"]:
                spaces[i] = spaces[-1]
                spaces.pop()
            elif box["h"] == space["h"]:
                space["x"] += box["w"]
                space["w"] -= box["w"]
            elif box["w"] == space["w"]:
                space["y"] += box["h"]
                space["h"] -= box["h"]
            else:
                spaces.append(
                    {
                        "x": space["x"] + box["w"],
                        "y": space["y"],
                        "w": space["w"] - box["w"],
                        "h": box["h"],
                    }
                )
                space["y"] += box["h"]
                space["h"] -= box["h"]
            break
    return width, height


def _decode_image(data: bytes):
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGBA"), np.uint8)


def build_atlas(gf: GLTFFile, texture_pixel_ratio: float = 0.5):
    """Pack the 4 texture slots of every material (atlas.ts:32-94).

    Returns (atlas float32 (S, S, 4), rects) where rects[mat_idx] is a dict
    of slot -> [x, y, w, h] in pixels (zeros when the slot is untextured).
    """
    gltf = gf.gltf
    materials = gltf.get("materials", [])
    textures = gltf.get("textures", [])

    def tex_image_index(tex_info):
        if not tex_info:
            return None
        tex = textures[tex_info["index"]]
        return tex.get("source")

    slots = ("albedo", "normal", "pbr", "emissive")
    boxes = []
    rects = []
    decoded: dict[int, np.ndarray] = {}
    for mat in materials:
        pbr = mat.get("pbrMetallicRoughness", {})
        slot_sources = {
            "albedo": tex_image_index(pbr.get("baseColorTexture")),
            "normal": tex_image_index(mat.get("normalTexture")),
            "pbr": tex_image_index(pbr.get("metallicRoughnessTexture")),
            "emissive": tex_image_index(mat.get("emissiveTexture")),
        }
        mat_rects = {}
        for slot in slots:
            src = slot_sources[slot]
            if src is None:
                mat_rects[slot] = None
                continue
            if src not in decoded:
                data = gf.image_bytes(src)
                decoded[src] = None if data is None else _decode_image(data)
            img = decoded[src]
            if img is None:
                mat_rects[slot] = None
                continue
            h, w = img.shape[0], img.shape[1]
            box = {
                "w": w * texture_pixel_ratio,
                "h": h * texture_pixel_ratio,
                "x": 0,
                "y": 0,
                "src": src,
                "albedo": slot == "albedo",
            }
            boxes.append(box)
            mat_rects[slot] = box
        rects.append(mat_rects)

    if not boxes:
        return None, [
            {s: [0, 0, 0, 0] for s in slots} for _ in range(len(materials))
        ]

    w, h = potpack(boxes)
    size = max(1, 2 ** math.ceil(math.log2(max(w, h))))  # atlas.ts:64-67

    atlas = np.zeros((size, size, 4), np.float32)
    atlas[..., 3] = 1.0  # black opaque background (atlas.ts:106-107)

    from PIL import Image

    for box in boxes:
        img = decoded[box["src"]]
        bw, bh = int(box["w"]), int(box["h"])
        if bw == 0 or bh == 0:
            continue
        resized = np.asarray(
            Image.fromarray(img).resize((bw, bh), Image.BILINEAR), np.uint8
        )
        if box["albedo"]:
            # sRGB->linear gamma 2.2 on 8-bit values, matching the canvas
            # round trip (atlas.ts:143-149).
            rgb = resized[..., 0:3].astype(np.float64) / 255.0
            rgb = np.clip(np.rint(np.power(rgb, 2.2) * 255.0), 0, 255)
            resized = resized.copy()
            resized[..., 0:3] = rgb.astype(np.uint8)
        x, y = int(box["x"]), int(box["y"])
        atlas[y : y + bh, x : x + bw] = resized.astype(np.float32) / 255.0

    out_rects = []
    for mat_rects in rects:
        out = {}
        for slot in slots:
            box = mat_rects[slot]
            if box is None:
                out[slot] = [0, 0, 0, 0]
            else:
                out[slot] = [int(box["x"]), int(box["y"]), int(box["w"]), int(box["h"])]
        out_rects.append(out)
    return atlas, out_rects


# --- materials (gpu.ts:358-421) ---------------------------------------------


def _build_material(mat: dict | None, mat_rects: dict | None):
    zero_rect = [0, 0, 0, 0]
    if mat is None:
        return dict(
            base_color=[1.0, 1.0, 1.0],
            metallic=0.0,
            roughness=0.1,
            emission=[0.0, 0.0, 0.0],
            emissive_strength=0.0,
            ior=1.5,
            transmission=0.0,
            albedo_rect=zero_rect,
            normal_rect=zero_rect,
            pbr_rect=zero_rect,
            emissive_rect=zero_rect,
        )
    pbr = mat.get("pbrMetallicRoughness", {})
    base = pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])
    ext = mat.get("extensions", {})
    rects = mat_rects or {}
    return dict(
        base_color=list(base[0:3]),
        metallic=pbr.get("metallicFactor", 1.0),
        roughness=pbr.get("roughnessFactor", 1.0),
        emission=list(mat.get("emissiveFactor", [0.0, 0.0, 0.0])),
        emissive_strength=ext.get("KHR_materials_emissive_strength", {}).get(
            "emissiveStrength", 1.0
        ),
        ior=ext.get("KHR_materials_ior", {}).get("ior", 1.5),
        transmission=ext.get("KHR_materials_transmission", {}).get(
            "transmissionFactor", 0.0
        ),
        albedo_rect=rects.get("albedo", zero_rect),
        normal_rect=rects.get("normal", zero_rect),
        pbr_rect=rects.get("pbr", zero_rect),
        emissive_rect=rects.get("emissive", zero_rect),
    )


# --- main entry (loader.ts:19-46 + gpu.ts:67-150) -----------------------------


def load_model(
    path: str,
    texture_pixel_ratio: float = 0.5,
    max_leaf_size: int = 4,
    num_bins: int = 12,
    enable_spot_lights: bool = False,
) -> SceneArrays:
    gf = GLTFFile.load(path)
    gltf = gf.gltf

    atlas, rects = build_atlas(gf, texture_pixel_ratio)

    khr_lights = (
        gltf.get("extensions", {}).get("KHR_lights_punctual", {}).get("lights", [])
    )

    worlds = _world_matrices(gltf)

    tri_v0, tri_v1, tri_v2 = [], [], []
    tri_n0, tri_n1, tri_n2 = [], [], []
    tri_uv0, tri_uv1, tri_uv2 = [], [], []
    tri_mat = []
    materials = []
    light_position, light_type, light_color, light_intensity = [], [], [], []
    light_aux = []

    for node_idx, node in enumerate(gltf.get("nodes", [])):
        world = worlds[node_idx]

        # Lights (gpu.ts:205-237)
        light_idx = node.get("extensions", {}).get("KHR_lights_punctual", {}).get(
            "light"
        )
        if light_idx is not None:
            light = khr_lights[light_idx]
            color = light.get("color", [1.0, 1.0, 1.0])
            intensity = light.get("intensity", 1.0)
            if light["type"] == "directional":
                rot = _quat_to_mat3(_mat3_to_quat(world[0:3, 0:3]))
                direction = rot @ np.array([0.0, 0.0, -1.0])
                light_position.append(direction)
                light_type.append(1)
                light_color.append(color)
                light_intensity.append(intensity)
                light_aux.append(np.zeros(5))
            elif light["type"] == "point":
                pos = (world @ np.array([0.0, 0.0, 0.0, 1.0]))[0:3]
                light_position.append(pos)
                light_type.append(2)
                light_color.append(color)
                light_intensity.append(intensity)
                light_aux.append(np.zeros(5))
            elif light["type"] == "spot" and enable_spot_lights:
                # Extension past the reference (which warns-and-skips,
                # gpu.ts:234-236): KHR_lights_punctual spot — position from
                # the world matrix, direction = world-rotated (0,0,-1),
                # squared angular falloff precomputed as scale/offset.
                pos = (world @ np.array([0.0, 0.0, 0.0, 1.0]))[0:3]
                rot = _quat_to_mat3(_mat3_to_quat(world[0:3, 0:3]))
                direction = rot @ np.array([0.0, 0.0, -1.0])
                spot = light.get("spot", {})
                inner = float(spot.get("innerConeAngle", 0.0))
                outer = float(spot.get("outerConeAngle", np.pi / 4.0))
                cos_i, cos_o = np.cos(inner), np.cos(outer)
                scale = 1.0 / max(1e-3, cos_i - cos_o)
                light_position.append(pos)
                light_type.append(3)
                light_color.append(color)
                light_intensity.append(intensity)
                light_aux.append(
                    np.concatenate([direction, [scale, -cos_o * scale]])
                )
            else:
                warnings.warn(f"Unsupported light type: {light['type']}")

        # Mesh (gpu.ts:239-298)
        if "mesh" not in node:
            continue
        mesh = gltf["meshes"][node["mesh"]]
        normal_mat = np.linalg.inv(world).T
        for prim in mesh.get("primitives", []):
            attrs = prim["attributes"]
            if "indices" not in prim:
                raise ValueError("No index found")  # gpu.ts:307-309
            pos32 = gf.accessor(attrs["POSITION"])
            nrm32 = gf.accessor(attrs["NORMAL"])
            idx = gf.accessor(prim["indices"]).reshape(-1).astype(np.int64)
            if "TEXCOORD_0" in attrs:
                uv = gf.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
            else:
                uv = np.zeros((pos32.shape[0], 2), np.float32)  # gpu.ts:310

            # World transform (gpu.ts:247-274) in float64, cast back to
            # f32 BEFORE the corner gathers (cast commutes with gather, so
            # values are bit-identical to gather-then-cast at half the
            # gather traffic). Identity nodes (the common case) skip the
            # f64 round trip outright — exact either way. The native
            # flattener (accel/cbvh/flatten.cpp) fuses transform +
            # renormalize + gather into one pass; the NumPy block below is
            # its fallback and bit-identity reference
            # (tests/test_flatten_native.py).
            i0, i1, i2 = idx[0::3], idx[1::3], idx[2::3]
            flat = None
            if native_available() and idx.size:
                try:
                    flat = flatten_native(pos32, nrm32, world, normal_mat,
                                          idx)
                except RuntimeError:
                    flat = None
            if flat is not None:
                v0c, v1c, v2c, n0c, n1c, n2c = flat
            else:
                if np.array_equal(world, np.eye(4)):
                    wpos = np.ascontiguousarray(pos32, np.float32)
                    nrm64 = nrm32.astype(np.float64)
                else:
                    pos = pos32.astype(np.float64)
                    wpos = (pos @ world[0:3, 0:3].T + world[0:3, 3]).astype(
                        np.float32)
                    nrm64 = nrm32.astype(np.float64) @ normal_mat[0:3, 0:3].T
                ln = np.linalg.norm(nrm64, axis=1, keepdims=True)
                ln[ln == 0] = 1.0
                wnrm = (nrm64 / ln).astype(np.float32)
                v0c, v1c, v2c = wpos[i0], wpos[i1], wpos[i2]
                n0c, n1c, n2c = wnrm[i0], wnrm[i1], wnrm[i2]
            tri_v0.append(v0c)
            tri_v1.append(v1c)
            tri_v2.append(v2c)
            tri_n0.append(n0c)
            tri_n1.append(n1c)
            tri_n2.append(n2c)
            tri_uv0.append(uv[i0])
            tri_uv1.append(uv[i1])
            tri_uv2.append(uv[i2])

            mat_idx = prim.get("material")
            gmat = None if mat_idx is None else gltf["materials"][mat_idx]
            grects = None if mat_idx is None else rects[mat_idx]
            materials.append(_build_material(gmat, grects))
            tri_mat.append(np.full(len(i0), len(materials) - 1, np.int32))

    if tri_v0:
        cat = lambda xs: np.concatenate(xs, axis=0)  # noqa: E731
        tv0, tv1, tv2 = cat(tri_v0), cat(tri_v1), cat(tri_v2)
        tn0, tn1, tn2 = cat(tri_n0), cat(tri_n1), cat(tri_n2)
        tu0, tu1, tu2 = cat(tri_uv0), cat(tri_uv1), cat(tri_uv2)
        tmat = cat(tri_mat)
    else:
        tv0 = tv1 = tv2 = tn0 = tn1 = tn2 = np.zeros((0, 3), np.float32)
        tu0 = tu1 = tu2 = np.zeros((0, 2), np.float32)
        tmat = np.zeros((0,), np.int32)

    if not materials:
        materials.append(_build_material(None, None))

    f32 = np.float32
    return finalize_scene(
        tv0.astype(f32), tv1.astype(f32), tv2.astype(f32),
        tn0.astype(f32), tn1.astype(f32), tn2.astype(f32),
        tu0.astype(f32), tu1.astype(f32), tu2.astype(f32),
        tmat,
        np.array([m["base_color"] for m in materials], f32),
        np.array([m["metallic"] for m in materials], f32),
        np.array([m["roughness"] for m in materials], f32),
        np.array([m["emission"] for m in materials], f32),
        np.array([m["emissive_strength"] for m in materials], f32),
        np.array([m["ior"] for m in materials], f32),
        np.array([m["transmission"] for m in materials], f32),
        mat_albedo_rect=np.array([m["albedo_rect"] for m in materials], np.int32),
        mat_normal_rect=np.array([m["normal_rect"] for m in materials], np.int32),
        mat_pbr_rect=np.array([m["pbr_rect"] for m in materials], np.int32),
        mat_emissive_rect=np.array([m["emissive_rect"] for m in materials], np.int32),
        light_position=np.array(light_position, f32).reshape(-1, 3),
        light_type=np.array(light_type, np.int32),
        light_color=np.array(light_color, f32).reshape(-1, 3),
        light_intensity=np.array(light_intensity, f32),
        light_aux=np.array(light_aux, f32).reshape(-1, 5),
        atlas=atlas,
        max_leaf_size=max_leaf_size,
        num_bins=num_bins,
    )
