"""Benchmark harness — one JSON line per BASELINE.json config, headline last.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` on the
HEADLINE line (Cornell 512x512, 512 spp, full MIS+NEE — printed LAST so the
driver's single-line parse picks it up) compares against a fixed
browser-WebGPU-class anchor of 100 Mrays/s, keeping the ratio meaningful
across rounds. The per-config lines cover BASELINE.json's five workloads:

1. cornell-128-nomis      Cornell, 128x128, 8 spp, no MIS (diffuse-path only)
2. cornell-512-mis        Cornell, 512x512, 64 spp, full BSDF + MIS/NEE
3. textured-cornell       synthetic atlas (checker albedo/PBR/normal maps)
4. glass-dof              glass_box.glb: transmission + IOR + depth of field
                          (HDR environment lighting is waived: the reference
                          renders miss->black, pt.wgsl:646-649 — BASELINE.md)
5. large-100k             tessellated Cornell, 102k tris (wide-BVH block-walk
                          intersector); multi-chip sharding of this config is
                          validated separately by __graft_entry__.dryrun_multichip
                          (only one physical chip is reachable here)
6. textured-512atlas      512x512 texel atlas (production scale) through
                          EXTERNAL atlas mode (XLA-side HBM texel gather
                          feeding the Pallas bounce) — measures the cliff
                          the old VMEM atlas bound used to hide
7. large-765k-paged       765k tris — past the resident walk's 80 MB VMEM
                          gate: the PAGED walk (leaf slabs DMA'd from HBM
                          per visit, double-buffered + prefetched) replaces
                          the 12x-slower pair-dispatch fallback
8. quality-dof-denoise    equal-QUALITY basis (the per-chip Mrays floors
                          are measured; quality-per-ray is the remaining
                          lever): display-space RMSE at 16 spp raw vs
                          denoised (ops/denoise.py) vs adaptive
                          (render/adaptive.py) on DoF-noise Cornell
9. interactive-256        the reference's operating regime (a rAF loop
                          blitting every frame, renderer.ts:456-473):
                          motion-to-fresh-frame latency and sustained
                          pipelined FPS at 256^2, with the measured
                          tunnel RTT separated out
10. shard-tax             render_chunk_sharded on a 1-device mesh vs
                          render_chunk on the same chip (headline + the
                          large-100k walk config): the measured overhead
                          of the shard_map program structure — the
                          per-chip cost floor an 8-chip run inherits
11. oracle-parity         ON-HARDWARE scalar-oracle arbitration of both
                          bounce implementations (tools/oracle_onchip.py
                          — the check that caught TWO Mosaic lowering
                          skews in round 4; CPU suites cannot see them),
                          on BOTH cornell and glass since round 5
12. gallery-atrium        sponza-stand-in (models/gallery.py): ~116k-tri
                          colonnaded atrium, 12 materials / 7 texture map
                          sets — walk + external fat-atlas gather on a
                          production-class scene

Each line: {"metric": "mrays_per_sec", "value": N, "unit": "Mrays/s",
"vs_baseline": N, "scene": ..., ...}. Select configs with
BENCH_CONFIGS=1,3 (env) when iterating.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_MRAYS = 100.0  # browser-WebGPU-class anchor (no published numbers)
MIN_SECONDS = 2.0  # repeat tiny configs until the wall clock is trustworthy


def _bench_renderer(r, spp: int, warmup_spp: int | None = None):
    """Warm up the compile cache, then time repeated renders of ``spp``.

    fetch=False skips the per-rep full-image pull (the reference never
    reads its GPU buffer back either); timing stays honest via the
    end-of-render counter sync, and the image is pulled + NaN-checked once
    after the clock stops."""
    r.render(spp=warmup_spp or spp)
    r.reset()
    reps = 0
    rays = 0
    t0 = time.perf_counter()
    while True:
        r.render(spp=spp, fetch=False)
        reps += 1
        rays += r.stats()["rays_total"]
        elapsed = time.perf_counter() - t0
        if elapsed >= MIN_SECONDS or reps >= 16:
            break
        r.reset()
    img = r.image()
    assert not np.isnan(img).any()
    return rays / elapsed / 1e6, elapsed / reps, rays


def _bench_sustained(r, spp: int, reps: int = 32):
    """Sustained interactive throughput: ``reps`` pipelined ``spp``-chunks
    with NO per-call host sync (render(sync=False)), one counter pull at
    the end. This is the reference's operating mode — a rAF loop that
    never blocks on the GPU (renderer.ts:456-473) — and the only
    meaningful basis for tiny canvases, whose from-scratch wall is the
    per-call host round trip (~100 ms through this tunnel), not device
    time."""
    # Warm pass: compiles the chunk program AND the one-pull counter
    # stack for this rep count (a fresh stack shape costs a remote
    # compile round trip that would otherwise land inside the clock).
    for _ in range(reps):
        r.render(spp=spp, fetch=False, sync=False)
    before = r.stats()["rays_total"]
    t0 = time.perf_counter()
    for _ in range(reps):
        r.render(spp=spp, fetch=False, sync=False)
    rays = r.stats()["rays_total"] - before  # stats() syncs the chain
    elapsed = time.perf_counter() - t0
    img = r.image()
    assert not np.isnan(img).any()
    return rays / elapsed / 1e6, elapsed / reps, rays


def _device_busy_ms(run_once, reps: int):
    """Reproducible device-busy via xprof (VERDICT r4 item 5): trace
    ``reps`` invocations of ``run_once`` (which must END SYNCED), merge
    overlapping X-phase event intervals on the TPU pid, and return busy
    ms per invocation. Unlike wall-clock through the tunnel (±20-700%
    across runs of identical code — the config-1/9 'weather'), this
    measured 3 reps identical to ±0.001 ms, so cross-round deltas are
    code, not tunnel."""
    import glob
    import gzip
    import shutil

    import jax

    d = "/tmp/bench_busy_trace"
    shutil.rmtree(d, ignore_errors=True)  # stale traces SUM (verify skill)
    run_once(reps)  # warm: compiles land outside the trace
    with jax.profiler.trace(d):
        run_once(reps)
    spans = []
    for path in glob.glob(d + "/plugins/profile/*/*.trace.json.gz"):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        ev = data.get("traceEvents", [])
        tpu_pids = {
            e.get("pid")
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e.get("args", {}).get("name", "")
        }
        spans.extend(
            (e["ts"], e["ts"] + e.get("dur", 0.0))
            for e in ev
            if e.get("ph") == "X" and e.get("pid") in tpu_pids
        )
    spans.sort()
    busy = 0.0
    end = -1.0
    for s, e in spans:
        if s > end:
            busy += e - s
            end = e
        elif e > end:
            busy += e - end
            end = e
    return busy / 1e3 / reps


def _emit(name, mrays, wall, rays, spp, extra=None):
    line = {
        "metric": "mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "scene": name,
        "spp": spp,
        "wall_clock_s": round(wall, 3),
        "rays_total": rays,
    }
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)
    return line


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    import jax

    # The env var alone is NOT enough here: the session's sitecustomize
    # imports jax before this file runs, so JAX_COMPILATION_CACHE_DIR is
    # read (as unset) long before the setdefault above. Set the config
    # explicitly or every bench run recompiles cold.
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wgpu_path_tracing_tpu import (
        Renderer,
        RenderConfig,
        cornell_box,
        textured_cornell,
    )

    dev = str(jax.devices()[0])
    sel = os.environ.get("BENCH_CONFIGS",
                         "1,2,3,4,5,6,7,8,9,10,11,12,headline")
    sel = {s.strip() for s in sel.split(",")}

    def _tunnel_rtt_ms(reps: int = 8) -> float:
        """Median round trip of a tiny device->host pull — the per-sync
        latency floor every interactive number below inherits (measured
        ~25-40 ms through the axon tunnel, ~0 on local devices)."""
        import jax.numpy as jnp

        a = jnp.zeros((2,), jnp.int32) + 1  # device-resident
        np.asarray(a)  # warm the transfer path + compile the add
        ts = []
        for _ in range(reps):
            # A FRESH device value each rep: jax Arrays cache their host
            # copy after the first np.asarray, so re-pulling the same
            # array measures nothing.
            a = a + 1
            t0 = time.perf_counter()
            np.asarray(a)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3)

    if "1" in sel:
        # frames_per_trace=8: a 128^2 trace call is only 16k lanes (1/16
        # of the dense kernels' tuned 262k); batching the chunk's 8
        # frames into one call measured 132.3 vs 109.9 Mrays/s at F=1
        # (post one-pull sync fix; images bit-identical across F).
        r = Renderer(RenderConfig(width=128, height=128, frames_per_chunk=8,
                                  do_mis=False, frames_per_trace=8))
        r.load_scene(cornell_box())
        mrays0, wall0, _ = _bench_renderer(r, spp=8)
        mrays, wall, rays = _bench_sustained(r, spp=8)

        # This config is dispatch-latency-DOMINATED, so its wall-clock
        # throughput is tunnel weather (measured 49.5-133 Mrays/s across
        # runs of IDENTICAL code). The primary value is therefore the
        # xprof device-busy per 8-spp chunk — reproducible to ±0.001 ms —
        # with the throughput numbers kept as extras (VERDICT r4 item 5;
        # the reference separates GPU pass time from CPU FPS for the
        # same reason, profiler.ts:112-125).
        def _run1(reps):
            for _ in range(reps):
                r.render(spp=8, fetch=False, sync=False)
            r.stats()  # syncs the chain

        busy = _device_busy_ms(_run1, 16)
        line = {
            "metric": "device_busy_ms_per_chunk",
            "value": round(busy, 3),
            "unit": "ms per 8-spp chunk (xprof, merged X intervals)",
            "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
            "scene": "cornell-128-nomis",
            "spp": 8,
            "sustained_mrays": round(mrays, 3),
            "sustained_wall_s": round(wall, 3),
            "rays_total": rays,
            "from_scratch_mrays": round(mrays0, 3),
            "from_scratch_wall_s": round(wall0, 3),
            "tunnel_rtt_ms": round(_tunnel_rtt_ms(), 1),
            "device": dev,
        }
        print(json.dumps(line), flush=True)

    if "2" in sel:
        r = Renderer(RenderConfig(width=512, height=512, frames_per_chunk=64))
        r.load_scene(cornell_box())
        mrays, wall, rays = _bench_renderer(r, spp=64)
        _emit("cornell-512-mis", mrays, wall, rays, 64, {"device": dev})

    if "3" in sel:
        r = Renderer(RenderConfig(width=512, height=512, frames_per_chunk=64))
        r.load_scene(textured_cornell())
        mrays, wall, rays = _bench_renderer(r, spp=64)
        _emit("textured-cornell", mrays, wall, rays, 64, {"device": dev})

    if "4" in sel:
        glb = "/root/reference/public/models/glass_box.glb"
        if os.path.exists(glb):
            # frames_per_trace=4 measured same-process: F=1 6.21 / F=4 6.91
            # / F=8 6.82 Mrays/s (walk-bound config; the dense-path
            # headline measured F>1 strictly WORSE — 262.6/234.8/219.2 at
            # F=1/2/4 — so only the walk configs batch frames).
            r = Renderer(RenderConfig(width=512, height=512, frames_per_chunk=32,
                                      frames_per_trace=4))
            r.load_model(glb)
            r.camera.aperture = 0.05  # real depth of field
            mrays, wall, rays = _bench_renderer(r, spp=32)
            _emit("glass-dof", mrays, wall, rays, 32,
                  {"device": dev, "env_lighting": "waived (parity: miss->black)"})

    if "5" in sel:
        # frames_per_trace=8: all 8 frames' rays ride ONE walk call per
        # scan step (2M lanes) — denser sort buckets + fuller compacted
        # tail blocks. Measured same-process A/B (round 3): F=1 1.282 /
        # F=4 1.446 / F=8 1.466 Mrays/s, images bit-identical.
        r = Renderer(RenderConfig(width=512, height=512, frames_per_chunk=8,
                                  frames_per_trace=8))
        r.load_scene(cornell_box(tessellation=55))  # 102,850 tris
        mrays, wall, rays = _bench_renderer(r, spp=8, warmup_spp=8)
        _emit("large-100k", mrays, wall, rays, 8,
              {"device": dev, "tris": r.scene.num_triangles,
               "multichip": "validated via dryrun_multichip (1 physical chip)"})

    if "6" in sel:
        # Congruent map set (the production-common case): pack bakes the
        # fat-atlas table so the external gather fetches ONE row per lane
        # (measured ~3.6x on the latency-bound per-row fetch, round 3).
        r = Renderer(RenderConfig(width=512, height=512, frames_per_chunk=64))
        r.load_scene(textured_cornell(atlas_size=512, congruent=True))
        assert "atlas_fat" in r._scene_dev, "fat atlas did not engage"
        mrays, wall, rays = _bench_renderer(r, spp=64)
        # Mixed per-slot resolutions (albedo a/2, pbr a/4) are DIVISIBLE
        # map sets — fat mode bakes them downsampled onto the rep grid
        # (models/types.py::_build_fat_atlas), so they ride the one-fetch
        # path too.
        r2 = Renderer(RenderConfig(width=512, height=512, frames_per_chunk=64))
        r2.load_scene(textured_cornell(atlas_size=512))
        assert "atlas_fat" in r2._scene_dev, "divisible fat did not engage"
        mrays2, _, _ = _bench_renderer(r2, spp=64)
        # NON-divisible map sets (here a 96^2 pbr rect against a 256^2
        # albedo) bake onto per-map-set LCM virtual rects since the
        # round-3+ generalization — the one-fetch path covers them too.
        sc3 = textured_cornell(atlas_size=512)
        sc3.mat_pbr_rect[0] = [256, 0, 96, 96]
        r3 = Renderer(RenderConfig(width=512, height=512, frames_per_chunk=64))
        r3.load_scene(sc3)
        assert "atlas_fat" in r3._scene_dev, "LCM fat did not engage"
        mrays3, _, _ = _bench_renderer(r3, spp=64)
        # TILED uvs (non-negative, past 1.0) ride fat mode since round 4:
        # every sampler wraps u to fmod(u, 1) before indexing, so the
        # bake stays texel-exact (the old [0,1] gate dropped these to the
        # ~15 Mrays/s per-slot path).
        sc5 = textured_cornell(atlas_size=512, congruent=True)
        for uv in (sc5.tri_uv0, sc5.tri_uv1, sc5.tri_uv2):
            uv[:] = np.asarray(uv) * 3.0
        r5 = Renderer(RenderConfig(width=512, height=512,
                                   frames_per_chunk=64))
        r5.load_scene(sc5)
        assert "atlas_fat" in r5._scene_dev, "tiled-uv fat did not engage"
        mrays5, _, _ = _bench_renderer(r5, spp=64)
        # NEGATIVE uvs ride fat mode since round 5 (per-axis doubled
        # grids bake the %-wrap's backward band — models/types.py): the
        # last texture cliff (these dropped to the ~15 Mrays/s per-slot
        # path through round 4).
        sc6 = textured_cornell(atlas_size=512, congruent=True)
        sc6.tri_uv0[:] = np.asarray(sc6.tri_uv0) - 1.0
        r6 = Renderer(RenderConfig(width=512, height=512,
                                   frames_per_chunk=64))
        r6.load_scene(sc6)
        assert "atlas_fat" in r6._scene_dev, "negative-uv fat did not engage"
        mrays6, _, _ = _bench_renderer(r6, spp=64)
        # The per-slot gather fallback (now reached only past the LCM
        # budget / out-of-[0,1] uvs) stays measured, not hidden: force it
        # by zeroing the bake budget.
        import wgpu_path_tracing_tpu.models.types as MT

        budget = MT.FAT_ATLAS_MAX_TEXELS
        try:
            MT.FAT_ATLAS_MAX_TEXELS = 0
            r4 = Renderer(RenderConfig(width=512, height=512,
                                       frames_per_chunk=64))
            r4.load_scene(textured_cornell(atlas_size=512, congruent=True))
            assert "atlas_fat" not in r4._scene_dev
        finally:
            MT.FAT_ATLAS_MAX_TEXELS = budget
        mrays4, _, _ = _bench_renderer(r4, spp=64)
        _emit("textured-512atlas", mrays, wall, rays, 64,
              {"device": dev,
               "atlas": "512x512 external HBM texel gather (fat, congruent)",
               "mixedres_mrays": round(mrays2, 3),
               "nondivisible_mrays": round(mrays3, 3),
               "tileduv_mrays": round(mrays5, 3),
               "neguv_mrays": round(mrays6, 3),
               "perslot_mrays": round(mrays4, 3)})

    if "7" in sel:
        # Past WALK_VMEM_BUDGET_BYTES (walk tables ~133 MB): auto selects
        # the PAGED walk — triangle slabs stay in HBM, each visited leaf
        # group's ~16 KB slab is DMA'd into a double-buffered VMEM ring,
        # prefetched one iteration ahead (ops/walk.py paged=True).
        # Measured bit-identical to the resident walk at +3% on the 103k
        # scene; end-to-end here it replaced the 0.123 Mrays/s pair
        # dispatch. The same canvas/spp as the round-3 pairs smoke keeps
        # the numbers comparable.
        r = Renderer(RenderConfig(width=128, height=128,
                                  frames_per_chunk=8, frames_per_trace=8))
        r.load_scene(cornell_box(tessellation=150))  # 765,002 tris
        # F=8 re-sweep with the round-4 canonical paged walk: 765k
        # 0.296/0.338 at F=4/8, 2M 0.181/0.204/0.225 at F=2/4/8
        # (same-process) — denser sort buckets and fuller compaction
        # tiers, exactly the single-chip F lever configs 4/5 already use.
        mrays, wall, rays = _bench_renderer(r, spp=8, warmup_spp=8)
        # The round-4 canonical+permutation order encoding lifted the
        # paged walk's SMEM ceiling ~3.8k -> ~10.2k wide nodes, so the
        # 2M-tri scene now AUTO-selects walk_hbm (round 3 fell to pairs
        # at 0.081 Mrays/s here). Record it, plus the forced pair
        # dispatch as the beyond-ceiling fallback number (VERDICT r3
        # item 8; reference bar: buildBVH handles arbitrary scenes,
        # bvh.ts:53).
        r2m = Renderer(RenderConfig(width=128, height=128,
                                    frames_per_chunk=8, frames_per_trace=8))
        r2m.load_scene(cornell_box(tessellation=243))  # 2,007,666 tris
        mrays_2m, _, _ = _bench_renderer(r2m, spp=8, warmup_spp=8)
        r2mp = Renderer(RenderConfig(width=128, height=128,
                                     frames_per_chunk=2, frames_per_trace=2,
                                     intersector="pairs"))
        r2mp.load_scene(cornell_box(tessellation=243))
        mrays_2mp, _, _ = _bench_renderer(r2mp, spp=2, warmup_spp=2)
        # Past BOTH paged-walk ceilings (int16 leaf-group order encoding
        # and the SMEM meta bound land together at ~3.3M tris,
        # TODO.md r5-handoff item 4): the pair dispatch is the unbounded
        # capability fallback. Record a ~4M-tri point every round so the
        # >3M regime carries a NUMBER (VERDICT r4 item 9; reference bar:
        # buildBVH accepts arbitrary scenes, bvh.ts:53).
        r4m = Renderer(RenderConfig(width=64, height=64,
                                    frames_per_chunk=1,
                                    intersector="pairs"))
        r4m.load_scene(cornell_box(tessellation=345))  # ~4.0M tris
        mrays_4m, _, _ = _bench_renderer(r4m, spp=1, warmup_spp=1)
        # Record the ACTUAL auto-selected strategies (expected walk_hbm
        # at both sizes) so a selection regression shows in the numbers
        # instead of crashing the bench mid-run.
        _emit("large-765k-paged", mrays, wall, rays, 8,
              {"device": dev, "tris": r.scene.num_triangles,
               "intersector": r.stats()["intersector"],
               "tris_2m_mrays": round(mrays_2m, 3),
               "tris_2m_tris": r2m.scene.num_triangles,
               "tris_2m_intersector": r2m.stats()["intersector"],
               "pairs_2m_mrays": round(mrays_2mp, 3),
               "pairs_4m_mrays": round(mrays_4m, 3),
               "pairs_4m_tris": r4m.scene.num_triangles})

    if "8" in sel:
        # Equal-QUALITY basis (extension: ops/denoise.py +
        # render/adaptive.py). Every kernel sits at its measured
        # hardware floor (BASELINE.md roofline), so wall-clock-to-quality
        # on one chip now improves only by needing fewer rays. DoF-noise
        # Cornell (aperture 0.25, same compile shapes as config 2);
        # display-space RMSE vs a 768-spp self-golden.
        import numpy as np_
        from wgpu_path_tracing_tpu.utils.image import buffer_to_srgb

        def _srgb(hdr):
            return buffer_to_srgb(hdr.reshape(-1, 3), 512, 512, 1.0)

        def _rmse(a, b):
            return float(np_.sqrt(np_.mean((a - b) ** 2)))

        def _mk():
            rq = Renderer(RenderConfig(width=512, height=512,
                                       frames_per_chunk=64))
            rq.load_scene(cornell_box())
            rq.camera.aperture = 0.25
            return rq

        rg = _mk()
        rg.render(spp=768, fetch=False)
        golden = _srgb(rg._row_major(rg._accum))

        ru = _mk()
        ru.render(spp=16, fetch=False)
        raw_hdr = ru._row_major(ru._accum).reshape(512, 512, 3)
        rmse_raw = _rmse(_srgb(raw_hdr), golden)
        rmse_dn = _rmse(_srgb(ru.denoise()), golden)

        ra = _mk()
        ada_hdr = ra.render_adaptive(16)
        rmse_ada = _rmse(_srgb(ada_hdr), golden)
        rmse_ada_dn = _rmse(_srgb(ra.denoise(hdr=ada_hdr)), golden)

        # raw RMSE scales ~a/sqrt(spp) until convergence; fit a from two
        # more raw points to estimate the uniform spp that matches the
        # best extension pipeline (floor-capped claims only).
        r64 = _mk()
        r64.render(spp=64, fetch=False)
        rmse_raw64 = _rmse(_srgb(r64._row_major(r64._accum)), golden)
        a_fit = float(np_.sqrt(16.0) * rmse_raw
                      + np_.sqrt(64.0) * rmse_raw64) / 2.0
        best = min(rmse_dn, rmse_ada_dn)
        equal_spp = (a_fit / best) ** 2
        line = {
            "metric": "display_rmse_16spp_denoised",
            "value": round(rmse_dn, 5),
            "unit": "rmse (sRGB, vs 768spp self-golden)",
            "vs_baseline": round(rmse_raw / rmse_dn, 3),
            "scene": "quality-dof-denoise",
            "rmse_raw_16spp": round(rmse_raw, 5),
            "rmse_adaptive_16spp": round(rmse_ada, 5),
            "rmse_adaptive_denoised_16spp": round(rmse_ada_dn, 5),
            "rmse_raw_64spp": round(rmse_raw64, 5),
            "equal_quality_uniform_spp_estimate": round(equal_spp, 1),
            "device": dev,
        }
        print(json.dumps(line), flush=True)

    if "9" in sel:
        # Interactive-loop parity evidence (VERDICT r3 item 5): the
        # reference's operating mode is a rAF loop blitting 1 spp per
        # frame with a live FPS meter (renderer.ts:456-473,
        # fps-meter.tsx:3-9). Numbers at 256^2: (a) motion-to-fresh-frame
        # latency — move_camera resets accumulation, render 1 spp, pull
        # the image; (b) sustained pipelined FPS — render(sync=False)
        # 1-spp chunks with no per-call host sync, one counter drain at
        # the end; (c) the tunnel RTT both inherit, separated out.
        rtt = _tunnel_rtt_ms()
        ri = Renderer(RenderConfig(width=256, height=256,
                                   frames_per_chunk=1))
        ri.load_scene(cornell_box())
        ri.render(spp=2)  # compile both the chunk and the image pull
        lats = []
        for i in range(5):
            t0 = time.perf_counter()
            ri.move_camera(0.0, 0.01 * (1 - 2 * (i & 1)), 0.0)
            img = ri.render(spp=1)
            lats.append(time.perf_counter() - t0)
        assert not np.isnan(img).any()
        m2f_ms = float(np.median(lats) * 1e3)
        reps = 64
        for _ in range(reps):  # warm the counter-stack shape
            ri.render(spp=1, fetch=False, sync=False)
        before = ri.stats()["rays_total"]
        t0 = time.perf_counter()
        for _ in range(reps):
            ri.render(spp=1, fetch=False, sync=False)
        rays = ri.stats()["rays_total"] - before  # stats() syncs
        sustained = reps / (time.perf_counter() - t0)

        # Primary value = xprof device-busy per 1-spp frame (the fps
        # number measured 44.9-336.2 across runs of identical code —
        # pure tunnel weather; busy reproduces to ±0.001 ms). fps and
        # motion-to-frame stay as extras (VERDICT r4 item 5).
        def _run9(reps_):
            for _ in range(reps_):
                ri.render(spp=1, fetch=False, sync=False)
            ri.stats()

        busy = _device_busy_ms(_run9, 16)
        line = {
            "metric": "interactive_device_busy_ms_per_frame",
            "value": round(busy, 3),
            "unit": "ms per 1-spp 256^2 frame (xprof, merged X intervals)",
            "vs_baseline": round(sustained / 60.0, 3),
            "scene": "interactive-256",
            "sustained_fps": round(sustained, 1),
            "motion_to_frame_ms": round(m2f_ms, 1),
            "tunnel_rtt_ms": round(rtt, 1),
            "rays_per_frame": int(rays // reps),
            "device": dev,
        }
        print(json.dumps(line), flush=True)

    if "10" in sel:
        # Sharding tax (VERDICT r3 item 1b): the same workload through
        # render_chunk_sharded on a 1-device mesh vs plain render_chunk —
        # the shard_map program-structure overhead (psum, spec
        # constraints) an 8-chip run inherits per chip. Measured on the
        # headline dense config and the large-100k walk config.
        from wgpu_path_tracing_tpu.parallel import shard as SH

        taxes = {}
        for name, cfg_kw, scene, spp in (
            ("headline", dict(width=512, height=512, frames_per_chunk=64),
             cornell_box(), 64),
            ("large-100k", dict(width=512, height=512, frames_per_chunk=8,
                                frames_per_trace=8),
             cornell_box(tessellation=55), 8),
        ):
            rA = Renderer(RenderConfig(**cfg_kw))
            rA.load_scene(scene)
            mraysA, _, _ = _bench_renderer(rA, spp=spp, warmup_spp=spp)
            rB = Renderer(RenderConfig(**cfg_kw), devices=jax.devices()[:1])
            rB.load_scene(scene)
            mraysB, _, _ = _bench_renderer(rB, spp=spp, warmup_spp=spp)
            taxes[name] = (mraysA, mraysB)
        line = {
            "metric": "sharding_tax",
            "value": round(taxes["headline"][1] / taxes["headline"][0], 4),
            "unit": "sharded/unsharded Mrays ratio (1-device mesh)",
            "vs_baseline": 1.0,
            "scene": "shard-tax",
            "headline_unsharded_mrays": round(taxes["headline"][0], 3),
            "headline_sharded_mrays": round(taxes["headline"][1], 3),
            "large100k_unsharded_mrays": round(taxes["large-100k"][0], 3),
            "large100k_sharded_mrays": round(taxes["large-100k"][1], 3),
            "large100k_ratio": round(
                taxes["large-100k"][1] / taxes["large-100k"][0], 4),
            "device": dev,
        }
        print(json.dumps(line), flush=True)

    if "11" in sel:
        # On-hardware oracle parity (round-4 lesson made permanent): the
        # compiled kernels are arbitrated against the scalar oracle every
        # round, so a Mosaic lowering skew (interpret==hardware is a
        # claim, not a fact) shows up as a failing bench line instead of
        # surviving for rounds. BOTH scene classes run: cornell (cheap
        # scalar oracle) AND glass — both round-4 Mosaic bugs manifested
        # on glass's transmission lobe (pt.wgsl:586-614) while cornell
        # measured exact on both paths, so cornell-only arbitration would
        # have caught neither. Glass's 11.8k-tri Python oracle costs
        # ~10 s/pixel; 4 pixels keeps the per-round cost bounded.
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        import oracle_onchip as _O

        res = _O.arbitrate("cornell", size=16, pixels=6, quiet=True)
        res_g = _O.arbitrate("glass", size=16, pixels=4, quiet=True)
        line = {
            "metric": "oracle_parity_ok",
            "value": 1 if (res["ok"] and res_g["ok"]) else 0,
            "unit": "bool (on-hardware scalar-oracle arbitration)",
            "vs_baseline": 1.0,
            "scene": "oracle-parity",
            **{k: res[k] for k in ("frac_divergent", "oracle_mismatch_xla",
                                   "oracle_mismatch_pallas",
                                   "shared_oracle_mismatch", "state_flips")},
            **{f"glass_{k}": res_g[k]
               for k in ("frac_divergent", "oracle_mismatch_xla",
                         "oracle_mismatch_pallas",
                         "shared_oracle_mismatch", "state_flips")},
            "glass_ok": 1 if res_g["ok"] else 0,
            "device": dev,
        }
        print(json.dumps(line), flush=True)
        assert res["ok"], "on-hardware oracle arbitration FAILED (cornell)"
        assert res_g["ok"], "on-hardware oracle arbitration FAILED (glass)"

    if "12" in sel:
        # Gallery / sponza-stand-in (VERDICT r4 item 8): the reference's
        # production demo GLB (sponza.glb) is stripped from the mirror,
        # so a procedural colonnaded atrium of the same CLASS stands in:
        # ~116k tris, 12 materials over 7 texture map sets (mixed-res
        # albedo/PBR/normal), multiple area lights — the wide-BVH walk +
        # EXTERNAL fat-atlas gather + denoiser, end to end. The gallery
        # image is rendered by tools/render_gallery.py and committed
        # under docs/gallery/.
        from wgpu_path_tracing_tpu.models.gallery import gallery_atrium

        rg = Renderer(RenderConfig(width=512, height=512,
                                   frames_per_chunk=8, frames_per_trace=8))
        rg.load_scene(gallery_atrium())
        rg.camera.position = np.array([0.0, 2.4, 3.0], np.float32)
        assert "atlas_fat" in rg._scene_dev, "gallery fat atlas missing"
        mrays, wall, rays = _bench_renderer(rg, spp=8, warmup_spp=8)
        _emit("gallery-atrium", mrays, wall, rays, 8,
              {"device": dev, "tris": rg.scene.num_triangles,
               "intersector": rg.stats()["intersector"],
               "map_sets": int(rg._scene_dev["atlas_fat_rects"].shape[0])})

    if "headline" in sel:
        r = Renderer(RenderConfig(width=512, height=512, frames_per_chunk=128))
        r.load_scene(cornell_box())
        r.render(spp=128)  # warmup / compile
        # Single-run wall clocks vary +-20% through the tunnel (BASELINE.md
        # caveats); report the best of two full renders.
        elapsed = float("inf")
        for _ in range(2):
            r.reset()
            t0 = time.perf_counter()
            r.render(spp=512, fetch=False)
            elapsed = min(elapsed, time.perf_counter() - t0)
        stats = r.stats()
        img = r.image()
        assert not np.isnan(img).any()
        mrays = stats["rays_total"] / elapsed / 1e6

        # Stable companion number (same rationale as configs 1/9): xprof
        # device-busy per 128-spp chunk, reproducible to ~0.1% where the
        # tunnel wall carries a ±20% band.
        def _runh(reps):
            for _ in range(reps):
                r.render(spp=128, fetch=False, sync=False)
            r.stats()

        busy = _device_busy_ms(_runh, 2)
        _emit("cornell-512x512", mrays, elapsed, stats["rays_total"], 512,
              {"wall_clock_512spp_s": round(elapsed, 3),
               "device_busy_ms_per_128spp_chunk": round(busy, 1),
               "device": dev})


if __name__ == "__main__":
    main()
