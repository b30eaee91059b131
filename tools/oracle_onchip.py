"""On-HARDWARE scalar-oracle arbitration (round-4 lesson, BASELINE.md).

CPU test suites cannot see hardware-lowering skew (Mosaic's default MXU
dot truncates operands to bf16 — the round-4 glass bug), and an on-chip
"bit-identical" A/B between two kernel variants cannot either, because
both variants share the skew. This tool closes that hole: it renders one
frame-0 tile on WHATEVER backend is default (the TPU under axon) through
BOTH bounce implementations — the XLA wavefront trace and the Pallas
megakernel — and arbitrates the most-divergent pixels against the scalar
oracle (tests/oracle.py, pure NumPy, backend-independent).

Usage:
    python tools/oracle_onchip.py [scene] [--size 16] [--pixels 6]

``scene``: "cornell" (default), "glass", or a .glb path. Exit code 0
when, for every arbitrated pixel, at least one implementation matches
the oracle AND the two implementations agree within the razor-tie class
(so a shared systematic skew — both wrong the same way — still fails:
the oracle is the judge, not the pair).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def arbitrate(scene_name: str = "cornell", size: int = 16,
              pixels: int = 6, quiet: bool = False) -> dict:
    """Run the arbitration programmatically (bench.py config 11 uses the
    fast cornell form every round). Returns
    {"ok", "frac_divergent", "oracle_mismatch_xla",
    "oracle_mismatch_pallas", "state_flips"}."""
    import types

    args = types.SimpleNamespace(scene=scene_name, size=size, pixels=pixels)
    return _run(args, quiet=quiet)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="cornell")
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--pixels", type=int, default=6)
    args = ap.parse_args()
    res = _run(args, quiet=False)
    return 0 if res["ok"] else 1


def _run(args, quiet: bool) -> dict:
    def say(*a):
        if not quiet:
            print(*a)

    import jax
    import jax.numpy as jnp

    from wgpu_path_tracing_tpu import Renderer, RenderConfig
    from wgpu_path_tracing_tpu.models.procedural import cornell_box
    from wgpu_path_tracing_tpu.ops import camera_rays as CAM
    from wgpu_path_tracing_tpu.ops import trace as TRACE
    from wgpu_path_tracing_tpu.ops.intersect import make_closest_hit
    from wgpu_path_tracing_tpu.ops.pallas_bounce import trace_pallas
    from wgpu_path_tracing_tpu.render.pipeline import camera_device

    W = H = args.size
    r = Renderer(RenderConfig(width=W, height=H, frames_per_chunk=1))
    if args.scene == "cornell":
        r.load_scene(cornell_box())
    elif args.scene == "glass":
        r.load_model("/root/reference/public/models/glass_box.glb")
    else:
        r.load_model(args.scene)
    scene, dev = r.scene, r._scene_dev
    cam_dev = camera_device(r.camera.as_pytree(), W, H)
    x, y = CAM.pixel_grid(W, H)
    ro, rd, state = CAM.generate_rays(cam_dev, x, y, jnp.int32(0),
                                      use_dof=True)
    nt = scene.num_triangles
    ch = make_closest_hit(dev, "brute", max(nt, 1), 4)
    rad_x, st_x, _ = TRACE.trace(dev, ch, ro, rd, state, max_bounces=8,
                                 do_mis=True, num_lights=scene.num_lights)
    # interpret only off-TPU; on the chip this is the COMPILED kernel —
    # the whole point.
    interp = jax.default_backend() in ("cpu", "gpu")
    rad_p, st_p, _ = trace_pallas(dev, ch, ro, rd, state, max_bounces=8,
                                  do_mis=True, num_lights=scene.num_lights,
                                  interpret=interp)
    rad_x, st_x = np.asarray(rad_x), np.asarray(st_x)
    rad_p, st_p = np.asarray(rad_p), np.asarray(st_p)
    d = np.abs(rad_x - rad_p).max(axis=-1)
    say(f"[{jax.default_backend()}] xla-vs-pallas: "
        f"{int((d > 0.01).sum())}/{W*H} lanes differ >0.01, "
        f"max {d.max():.4f}, state flips {int((st_x != st_p).sum())}")

    from tests.oracle import Oracle

    c = r.camera
    cam_np = {
        "position": np.asarray(c.position), "forward": np.asarray(c.forward),
        "right": np.asarray(c.right), "up": np.asarray(c.up),
        "fov": np.float32(c.fov), "aspect": np.float32(c.aspect),
        "aperture": np.float32(c.aperture),
        "focus_distance": np.float32(c.focus_distance),
    }
    oracle = Oracle(scene, cam_np, W, H)
    order = np.argsort(-d)[: args.pixels]
    bad_x = bad_p = shared_bad = 0
    for lane in order:
        px, py = int(lane % W), int(lane // W)
        exp = np.asarray(oracle.render_pixel(px, py, 0), np.float32)
        o_state = int(oracle.rng.state)
        gx = np.minimum(rad_x[lane], 2.5)
        gp = np.minimum(rad_p[lane], 2.5)
        # An implementation whose end state differs from the oracle's
        # took a different (razor-tie) branch path — its radiance is
        # legitimately incomparable; only state-synced values must match.
        sync_x = int(st_x[lane]) == o_state
        sync_p = int(st_p[lane]) == o_state
        ok_x = (not sync_x) or np.allclose(gx, exp, rtol=2e-3, atol=2e-3)
        ok_p = (not sync_p) or np.allclose(gp, exp, rtol=2e-3, atol=2e-3)
        bad_x += not ok_x
        bad_p += not ok_p
        # BOTH state-synced and BOTH off the oracle: the shared-skew
        # signature (a bug in code both implementations share — e.g. a
        # vectorization error in ops/shade.py — diverges from the scalar
        # oracle without the two implementations diverging from each
        # other, so frac_divergent cannot see it).
        shared_bad += (not ok_x) and (not ok_p)
        say(f"pixel ({px:3d},{py:3d}): oracle {exp.round(4)} "
            f"xla {gx.round(4)}{'*' if ok_x else 'X'} "
            f"pallas {gp.round(4)}{'*' if ok_p else 'X'} "
            f"{'' if sync_x else '[xla-desync]'}"
            f"{'' if sync_p else '[pallas-desync]'}")
    frac = float((d > 0.01).mean())
    res = {"ok": True, "frac_divergent": round(frac, 4),
           "oracle_mismatch_xla": bad_x, "oracle_mismatch_pallas": bad_p,
           "shared_oracle_mismatch": shared_bad,
           "state_flips": int((st_x != st_p).sum())}
    if shared_bad >= max(3, args.pixels // 2):
        # Round-5 tightening: a single-sided oracle flip on a razor-tie
        # pixel is the expected class (scalar-vs-fused FMA placement),
        # but BOTH implementations off the oracle on half the arbitrated
        # state-synced pixels means the shared code disagrees with the
        # reference semantics — the oracle is the judge, not the pair.
        res["ok"] = False
        say(f"FAIL: {shared_bad}/{args.pixels} arbitrated pixels have "
            "BOTH implementations state-synced yet off the oracle — "
            "shared-code skew (frac_divergent cannot see this class)")
        return res
    if frac <= 0.10:
        # Razor-tie class: the two implementations are separate XLA
        # programs, so fusion/FMA placement differs and knife-edge
        # decisions (occlusion t comparisons, RR, razor-tie winners) flip
        # on a few % of single-sample lanes — WITHOUT either being
        # systematically wrong (glass measured ~5% at 1 spp; the round-4
        # bf16 bug measured 91%). The top-divergent arbitration above is
        # diagnostic: on a flip pixel the oracle sides with whichever
        # program's fusion matched its scalar evaluation, so scattered
        # one-off mismatches are expected here; a CONSISTENT one-sided
        # pattern on a large-divergence run is what signals a real skew.
        say(f"PASS: implementations agree on {100*(1-frac):.1f}% of "
            "lanes — residual is the razor-tie flip class, not a "
            "systematic skew")
        return res
    res["ok"] = False
    if bad_x or bad_p:
        say(f"FAIL: {100*frac:.0f}% of lanes diverge AND the oracle "
            f"sides against an implementation on state-synced pixels "
            f"(xla {bad_x}, pallas {bad_p} of {args.pixels}) — "
            "systematic hardware skew; the round-4 bf16 bug showed "
            "exactly this signature (91% lanes, pallas mismatching "
            "while xla matched)")
        return res
    say(f"WARN: {100*frac:.0f}% of lanes diverge but every arbitrated "
        "state-synced pixel matches the oracle in both — raise "
        "--pixels and investigate")
    return res


if __name__ == "__main__":
    raise SystemExit(main())
