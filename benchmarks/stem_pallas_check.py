"""On-chip check + bench of the Pallas fused stem (ops/stem_pallas.py).

Correctness of ``fused_stem_planar`` vs the XLA composition at the real
stage-0/1 shapes, then scan-amortized timing against the plain stage.

Reference precision matters on TPU: ``lax.conv_general_dilated`` at
DEFAULT precision runs one-pass bf16 on the MXU (maxerr ~4e-3 vs exact
f32 at stage-0 K=27, ~9e-3 at stage-1 K=144), while the planar kernel's
dots default to HIGHEST (true f32). The exactness assert therefore
compares against the HIGHEST-precision conv; the default-precision gap
is printed for the record (it is the REFERENCE's rounding, not the
kernel's — first diagnosed round 3 when every on-chip case "failed" at
3.9e-3 against a default-precision reference).

    python benchmarks/stem_pallas_check.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import __graft_entry__  # noqa: F401
from benchmarks.backbone_profile import bench_scanned
from millieye_tpu.ops.stem_pallas import (fused_stem_planar,
                                          fused_stem2_planar,
                                          fused_stem2_phase)


def plain(x, w, b, precision=None):
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                 precision=precision) + b
    y = jnp.where(y > 0, y, 0.1 * y)
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), [(0, 0)] * 4)


def main_stem2():
    """Double-fused two-stage kernel (argv[1] == "stem2"): exactness vs
    the XLA two-stage composition, then scan-amortized timing against
    (a) the XLA stages at HIGHEST and DEFAULT precision and (b) two
    single-stage Pallas calls — the e2e-relevant baselines (round-3
    lesson: the e2e XLA stem is much cheaper than the HIGHEST-precision
    standalone stage the first check compared against)."""
    rng = np.random.default_rng(0)
    b_sz, h, cin, cmid, cout = 32, 416, 3, 16, 32
    x = jnp.asarray(rng.uniform(-1, 1, (b_sz, h, h, cin)), jnp.float32)
    w0 = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.05 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.05 * rng.standard_normal(cout), jnp.float32)

    def two_stage(x, prec):
        return plain(plain(x, w0, b0, prec), w1, b1, prec)

    got = np.asarray(fused_stem2_planar(x, w0, b0, w1, b1))
    ref_hi = np.asarray(jax.jit(
        lambda a: two_stage(a, lax.Precision.HIGHEST))(x))
    e_hi = np.abs(got - ref_hi).max()
    print(f"stem2 b{b_sz} {h}x{cin}->{cmid}->{cout}: maxerr {e_hi:.2e}",
          flush=True)
    assert e_hi < 1e-4, e_hi
    got_ph = np.asarray(fused_stem2_phase(x, w0, b0, w1, b1))
    e_ph = np.abs(got_ph - ref_hi).max()
    print(f"stem2_phase maxerr {e_ph:.2e}", flush=True)
    assert e_ph < 1e-4, e_ph
    from millieye_tpu.ops.stem_pallas import (fused_stem2_packed,
                                              fused_stem2_s2d)
    # DEFAULT-precision f32-scratch packed/s2d vs the phase kernel:
    # identical products and rounding (the packing/s2d indexing only
    # regroups independent outputs; accumulation-tree order may differ
    # at the last f32 bit) — the flagship-replacement candidates the r4
    # gate never measured (it only ran the bf16-scratch forms, which
    # crashed the compile helper pre the DMA tile-alignment fix)
    ph_def = np.asarray(fused_stem2_phase(x, w0, b0, w1, b1,
                                          precision="default"))
    for nm, fn in (
        ("packed_default", lambda: fused_stem2_packed(
            x, w0, b0, w1, b1, precision="default")),
        ("s2d_default", lambda: fused_stem2_s2d(
            x, w0, b0, w1, b1, precision="default")),
        ("packed_bf16s", lambda: fused_stem2_packed(
            x, w0, b0, w1, b1, precision="default",
            scratch_dtype=jnp.bfloat16)),
        ("s2d_bf16s", lambda: fused_stem2_s2d(
            x, w0, b0, w1, b1, precision="default",
            scratch_dtype=jnp.bfloat16)),
    ):
        try:
            e_v = np.abs(np.asarray(fn()) - ph_def).max()
            print(f"stem2_{nm} vs phase_default maxerr {e_v:.2e}",
                  flush=True)
        except Exception as e:  # Mosaic rejection must not kill the gate
            print(f"stem2_{nm} FAILED {str(e)[:200]}", flush=True)
    g16 = np.asarray(fused_stem2_planar(x, w0, b0, w1, b1,
                                        out_dtype=jnp.float16))
    assert g16.dtype == np.float16
    print(f"  f16-store maxerr "
          f"{np.abs(g16.astype(np.float32) - ref_hi).max():.2e}", flush=True)

    for name, f in (
        ("xla_highest", lambda z: two_stage(z, lax.Precision.HIGHEST)),
        ("xla_default", lambda z: two_stage(z, None)),
        ("pallas_2call", lambda z: fused_stem_planar(
            fused_stem_planar(z, w0, b0, band=16), w1, b1, band=16)),
        ("pallas_2call_def", lambda z: fused_stem_planar(
            fused_stem_planar(z, w0, b0, band=16, precision="default"),
            w1, b1, band=16, precision="default")),
        ("stem2", lambda z: fused_stem2_planar(z, w0, b0, w1, b1)),
        ("stem2_default", lambda z: fused_stem2_planar(
            z, w0, b0, w1, b1, precision="default")),
        ("phase", lambda z: fused_stem2_phase(z, w0, b0, w1, b1)),
        ("phase_default", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default")),
        # ---- the r5 candidates: DEFAULT dots, f32 scratches ----
        ("packed_default", lambda z: fused_stem2_packed(
            z, w0, b0, w1, b1, precision="default")),
        ("packed_s1p_def", lambda z: fused_stem2_packed(
            z, w0, b0, w1, b1, precision="default", pack_stage1=False)),
        ("s2d_default", lambda z: fused_stem2_s2d(
            z, w0, b0, w1, b1, precision="default")),
        ("s2d8_default", lambda z: fused_stem2_s2d(
            z, w0, b0, w1, b1, precision="default", groups0=8)),
        # ---- bf16 scratches, post DMA tile-alignment fix ----
        ("phase_bf16s", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default",
            scratch_dtype=jnp.bfloat16)),
        ("packed_bf16s", lambda z: fused_stem2_packed(
            z, w0, b0, w1, b1, precision="default",
            scratch_dtype=jnp.bfloat16)),
        ("packed_s1plain", lambda z: fused_stem2_packed(
            z, w0, b0, w1, b1, precision="default",
            scratch_dtype=jnp.bfloat16, pack_stage1=False)),
        ("s2d_bf16s", lambda z: fused_stem2_s2d(
            z, w0, b0, w1, b1, precision="default",
            scratch_dtype=jnp.bfloat16)),
        ("s2d8_bf16s", lambda z: fused_stem2_s2d(
            z, w0, b0, w1, b1, precision="default",
            scratch_dtype=jnp.bfloat16, groups0=8)),
        # ---- compile-crash bisect (one bf16 buffer at a time) ----
        ("phase_bf16_xb", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default", bf16_only="xb")),
        ("phase_bf16_s0", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default", bf16_only="s0")),
        ("phase_bf16_s1", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default", bf16_only="s1")),
        # ---- HIGHEST-precision forms (chip-proven in the r4 gate) ----
        ("packed_highest", lambda z: fused_stem2_packed(
            z, w0, b0, w1, b1)),
        ("s2d_highest", lambda z: fused_stem2_s2d(
            z, w0, b0, w1, b1)),
    ):
        try:
            t = bench_scanned(f, x, k=10)
            print(f"  {name:.<18} {t*1e6:.0f} us/batch "
                  f"({b_sz/t:.0f} fps)", flush=True)
        except Exception as e:
            print(f"  {name:.<18} FAILED {str(e)[:140]}", flush=True)


def main_deep():
    """Deep stem stages (argv[1] == "deep"): the generic planar kernel
    at the stage-4 (104px, cin 32) and stage-6 (52px, cin 64) shapes —
    exactness vs the HIGHEST XLA composition, then scan-amortized timing
    against the e2e-relevant XLA baselines. The campaign's deep gate
    parses the ``deep_s{4,6}_default`` lines: the pallas_deep preset
    only enters the e2e ladder if BOTH stages beat xla_default."""
    rng = np.random.default_rng(0)
    for tag, (b_sz, h, cin, cout) in (("s4", (32, 104, 32, 64)),
                                      ("s6", (32, 52, 64, 128))):
        x = jnp.asarray(rng.uniform(-1, 1, (b_sz, h, h, cin)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)),
                        jnp.float32)
        bias = jnp.asarray(0.05 * rng.standard_normal(cout), jnp.float32)

        got = np.asarray(fused_stem_planar(x, w, bias))
        ref_hi = np.asarray(jax.jit(
            lambda a: plain(a, w, bias, lax.Precision.HIGHEST))(x))
        e_hi = np.abs(got - ref_hi).max()
        print(f"deep {tag} b{b_sz} {h}x{cin}->{cout}: maxerr {e_hi:.2e}",
              flush=True)
        assert e_hi < 1e-4, e_hi

        for name, f in (
            (f"deep_{tag}_xla_hi", lambda z: plain(
                z, w, bias, lax.Precision.HIGHEST)),
            (f"deep_{tag}_xla_def", lambda z: plain(z, w, bias)),
            # the e2e serving path runs bf16 storage around these
            # stages: time the bf16-in/bf16-out XLA stage too
            (f"deep_{tag}_xla_bf16", lambda z: plain(
                z.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                bias.astype(jnp.bfloat16))),
            (f"deep_{tag}_highest", lambda z: fused_stem_planar(
                z, w, bias)),
            (f"deep_{tag}_default", lambda z: fused_stem_planar(
                z, w, bias, precision="default")),
        ):
            try:
                t = bench_scanned(f, x, k=10)
                print(f"  {name:.<22} {t*1e6:.0f} us/batch "
                      f"({b_sz/t:.0f} fps)", flush=True)
            except Exception as e:
                print(f"  {name:.<22} FAILED {str(e)[:140]}", flush=True)


def main_pair2(rng=None):
    """Deep PAIR (argv[1] == "pair2"): stages 4+6 as ONE fused_stem2_s2d
    kernel (g0=2 full-M tiling, 104 px row-padded to 128) — exactness vs
    the XLA two-stage composition, then scan timing against xla_default,
    the two single-stage planar kernels (the pallas_deep spelling), and
    the serving bf16-scratch variant. Campaign parses the
    ``pair2_*`` lines; pallas_pair2 enters the e2e ladder only if the
    pair beats BOTH xla_default and the single-stage pair."""
    from millieye_tpu.ops.stem_pallas import fused_stem2_s2d

    rng = rng or np.random.default_rng(0)
    b_sz, h, cin, cmid, cout = 32, 104, 32, 64, 128
    x = jnp.asarray(rng.uniform(-1, 1, (b_sz, h, h, cin)), jnp.float32)
    w0 = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.05 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.05 * rng.standard_normal(cout), jnp.float32)

    def two_stage(z, prec):
        return plain(plain(z, w0, b0, prec), w1, b1, prec)

    got = np.asarray(fused_stem2_s2d(x, w0, b0, w1, b1, groups0=2))
    ref_hi = np.asarray(jax.jit(
        lambda a: two_stage(a, lax.Precision.HIGHEST))(x))
    e_hi = np.abs(got - ref_hi).max()
    print(f"pair2 b{b_sz} {h}x{cin}->{cmid}->{cout}: maxerr {e_hi:.2e}",
          flush=True)
    assert e_hi < 1e-4, e_hi

    for name, f in (
        ("pair2_xla_def", lambda z: two_stage(z, None)),
        ("pair2_singles", lambda z: fused_stem_planar(
            fused_stem_planar(z, w0, b0, precision="default"),
            w1, b1, precision="default")),
        ("pair2_s2d_hi", lambda z: fused_stem2_s2d(
            z, w0, b0, w1, b1, groups0=2)),
        ("pair2_s2d_bf16s", lambda z: fused_stem2_s2d(
            z, w0, b0, w1, b1, groups0=2, precision="default",
            scratch_dtype=jnp.bfloat16)),
        # group-count ablation (4 = the stage-0 packing factor, 75%
        # block-diagonal K waste at cin=32)
        ("pair2_s2d4_bf16s", lambda z: fused_stem2_s2d(
            z, w0, b0, w1, b1, groups0=4, precision="default",
            scratch_dtype=jnp.bfloat16)),
    ):
        try:
            t = bench_scanned(f, x, k=10)
            print(f"  {name:.<22} {t*1e6:.0f} us/batch "
                  f"({b_sz/t:.0f} fps)", flush=True)
        except Exception as e:
            print(f"  {name:.<22} FAILED {str(e)[:140]}", flush=True)


def main_stem2new():
    """Round-5b candidates only (argv[1] == "stem2new") — a tight gate
    for tunnel iteration: the baseline phase_default plus the spellings
    built on the r5 bisect verdict (bf16 s0+s1 compile and win; bf16 xb
    DMA crashes): phase_s0s1 (bf16 scratches over the f32 DMA) and the
    vmem-input kernel (no user DMA; the only chip-legal bf16-input
    path). Exactness is asserted vs phase_default (identical products
    for vmem_def; DEFAULT-rounding class for the bf16-scratch rows)."""
    rng = np.random.default_rng(0)
    b_sz, h, cin, cmid, cout = 32, 416, 3, 16, 32
    x = jnp.asarray(rng.uniform(-1, 1, (b_sz, h, h, cin)), jnp.float32)
    w0 = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.05 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.05 * rng.standard_normal(cout), jnp.float32)

    ph_def = np.asarray(fused_stem2_phase(x, w0, b0, w1, b1,
                                          precision="default"))
    variants = (
        ("phase_s0s1", dict(precision="default", bf16_only="s0s1"),
         2e-2),
        ("vmem_def", dict(precision="default", input_mode="vmem"),
         1e-5),
        ("vmem_s0s1", dict(precision="default", input_mode="vmem",
                           bf16_only="s0s1"), 2e-2),
        ("vmem_bf16s", dict(precision="default", input_mode="vmem",
                            scratch_dtype=jnp.bfloat16), 2e-2),
    )
    for nm, kw, tol in variants:
        try:
            e_v = np.abs(np.asarray(fused_stem2_phase(
                x, w0, b0, w1, b1, **kw)) - ph_def).max()
            ok = "ok" if e_v < tol else "EXCEEDS TOL"
            print(f"stem2new_{nm} vs phase_default maxerr {e_v:.2e} {ok}",
                  flush=True)
        except Exception as e:
            print(f"stem2new_{nm} FAILED {str(e)[:200]}", flush=True)

    for name, f in (
        ("phase_default", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default")),
        ("phase_s0s1", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default", bf16_only="s0s1")),
        ("vmem_def", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default", input_mode="vmem")),
        ("vmem_s0s1", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default", input_mode="vmem",
            bf16_only="s0s1")),
        ("vmem_bf16s", lambda z: fused_stem2_phase(
            z, w0, b0, w1, b1, precision="default", input_mode="vmem",
            scratch_dtype=jnp.bfloat16)),
    ):
        try:
            t = bench_scanned(f, x, k=10)
            print(f"  {name:.<18} {t*1e6:.0f} us/batch "
                  f"({b_sz/t:.0f} fps)", flush=True)
        except Exception as e:
            print(f"  {name:.<18} FAILED {str(e)[:140]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    variant = sys.argv[1] if len(sys.argv) > 1 else "batched"
    if variant == "stem2":
        return main_stem2()
    if variant == "stem2new":
        return main_stem2new()
    if variant == "deep":
        return main_deep()
    if variant == "pair2":
        return main_pair2()
    for (b_sz, h, cin, cout, band) in ((32, 416, 3, 16, 16),
                                       (32, 208, 16, 32, 16),
                                       (1, 416, 3, 16, 16)):
        x = jnp.asarray(rng.uniform(-1, 1, (b_sz, h, h, cin)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)),
                        jnp.float32)
        bias = jnp.asarray(0.05 * rng.standard_normal(cout), jnp.float32)

        got = np.asarray(fused_stem_planar(x, w, bias, band=band,
                                           variant=variant))
        ref_hi = np.asarray(jax.jit(
            lambda a, b, c: plain(a, b, c, lax.Precision.HIGHEST))(x, w, bias))
        ref_df = np.asarray(jax.jit(plain)(x, w, bias))
        e_hi = np.abs(got - ref_hi).max()
        e_df = np.abs(got - ref_df).max()
        print(f"{variant} b{b_sz} {h}x{cin}->{cout}: maxerr {e_hi:.2e} "
              f"(default-precision ref is itself {e_df:.2e} off)", flush=True)
        assert e_hi < 1e-4, e_hi

        if h == 416 and b_sz == 32:
            # f16 store (the hi_prec_store ladder's dtype): Mosaic has no
            # f16, so the kernel must store f32 and cast outside — this
            # compiles the exact spelling the e2e pallas_stem preset uses
            got16 = np.asarray(fused_stem_planar(
                x, w, bias, band=band, variant=variant,
                out_dtype=jnp.float16))
            assert got16.dtype == np.float16, got16.dtype
            e16 = np.abs(got16.astype(np.float32) - ref_hi).max()
            print(f"  f16-store maxerr {e16:.2e}", flush=True)
            assert e16 < 2e-3, e16

        t_plain = bench_scanned(lambda z, _w=w, _b=bias: plain(z, _w, _b),
                                x, k=10)
        t_pallas = bench_scanned(
            lambda z, _w=w, _b=bias: fused_stem_planar(
                z, _w, _b, band=band, variant=variant),
            x, k=10)
        print(f"  plain {t_plain*1e6:.0f} us  pallas {t_pallas*1e6:.0f} us"
              f"  ({t_plain/max(t_pallas,1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
