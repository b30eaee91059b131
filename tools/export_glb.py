"""Export a procedural scene to a binary .glb (thin CLI over
wgpu_path_tracing_tpu/models/export.py::scene_to_glb — see that module for
the format details; `python -m wgpu_path_tracing_tpu.cli export` is the
packaged equivalent).

Usage: python tools/export_glb.py <out.glb> [cornell|textured|large N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wgpu_path_tracing_tpu.models.export import scene_to_glb  # noqa: E402,F401


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    out = sys.argv[1]
    kind = sys.argv[2] if len(sys.argv) > 2 else "cornell"
    from wgpu_path_tracing_tpu.models.procedural import (
        cornell_box, textured_cornell)

    if kind == "cornell":
        scene = cornell_box()
    elif kind == "textured":
        scene = textured_cornell()
    elif kind == "large":
        tess = int(sys.argv[3]) if len(sys.argv) > 3 else 55
        scene = cornell_box(tessellation=tess)
    else:
        raise SystemExit(f"unknown scene kind: {kind}")
    blob = scene_to_glb(scene)
    with open(out, "wb") as f:
        f.write(blob)
    print(f"{out}: {len(blob)} bytes, {scene.num_triangles} tris")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
