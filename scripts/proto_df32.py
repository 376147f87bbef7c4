"""Prototype: double-f32 (compensated) H formation vs XLA's f64 emulation.

The certified tail's dominant cost is the weighted-Gram H formation
einsum in emulated f64 (107 ms of a ~139 ms iteration at batch 2048).
XLA's TPU f64 emulation runs ~45 GFLOP/s-equivalent (~1% of VPU); a
hand-vectorized double-f32 scheme (each f64 as an (hi, lo) f32 pair,
Dekker two-prod + compensated accumulation over the row axis) should
reach ~1e-14 relative accuracy at a large speedup.

Usage: python scripts/proto_df32.py [B]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    f32, f64 = jnp.float32, jnp.float64
    m_si, m_d, nz = 103, 84, 19
    m = m_si + m_d

    rng = np.random.default_rng(0)
    GsZ = jnp.asarray(rng.normal(size=(m_si, nz)), f64)
    GdZ = jnp.asarray(rng.normal(size=(B, m_d, nz)), f64)
    # brutal D range as in the late tail (active rows ~1e12, inactive ~0)
    logd = rng.uniform(-6, 12, size=(B, m))
    D = jnp.asarray(10.0 ** logd, f64)

    def ref():
        return (jnp.einsum("mi,bm,mj->bij", GsZ, D[:, :m_si], GsZ,
                           preferred_element_type=f64)
                + jnp.einsum("bmi,bm,bmj->bij", GdZ, D[:, m_si:], GdZ,
                             preferred_element_type=f64))

    # ---- double-f32 machinery (vectorized f32; no FMA assumed) ----------
    SPLIT = jnp.float32(4097.0)        # 2^12 + 1 (Dekker split for f32)

    def two_prod(a, b):
        """Exact product of f32 a*b as (p, e): p + e == a*b exactly."""
        p = a * b
        a1 = a * SPLIT
        ah = a1 - (a1 - a)
        al = a - ah
        b1 = b * SPLIT
        bh = b1 - (b1 - b)
        bl = b - bh
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return p, e

    def two_sum(a, b):
        """Exact sum of f32 a+b as (s, e)."""
        s = a + b
        v = s - a
        e = (a - (s - v)) + (b - v)
        return s, e

    def split64(x):
        hi = x.astype(f32)
        lo = (x - hi.astype(f64)).astype(f32)
        return hi, lo

    def df32_gram(G, Dw):
        """H[b, i, j] = sum_m Dw[b, m] G[.., m, i] G[.., m, j] in df32.

        G: [m, nz] (shared) or [B, m, nz]; Dw: [B, m] f64.
        Accumulates with a compensated (hi, err) pair over a scanned m
        axis; each term is w*(g_i*g_j) to ~1e-14 relative.
        Returns f64 [B, nz, nz]."""
        Gh, Gl = split64(G)
        Wh, Wl = split64(Dw)
        shared = G.ndim == 2

        # scan over m: carry (acc_hi, acc_lo) of shape [B, nz, nz]
        def body(carry, inputs):
            acc_h, acc_l = carry
            if shared:
                gh, gl, wh, wl = inputs      # gh [nz], wh [B]
                oij_p, oij_e = two_prod(gh[:, None], gh[None, :])  # [nz,nz]
                cross = gh[:, None] * gl[None, :] + gl[:, None] * gh[None, :]
                # w * outer in df32: t = wh*oij (exact) + wh*(e+cross) + wl*oij
                t_p, t_e = two_prod(wh[:, None, None], oij_p[None])
                t_e = t_e + wh[:, None, None] * (oij_e + cross)[None] \
                    + wl[:, None, None] * oij_p[None]
            else:
                gh, gl, wh, wl = inputs      # gh [B, nz], wh [B]
                oij_p, oij_e = two_prod(gh[:, :, None], gh[:, None, :])
                cross = gh[:, :, None] * gl[:, None, :] \
                    + gl[:, :, None] * gh[:, None, :]
                t_p, t_e = two_prod(wh[:, None, None], oij_p)
                t_e = t_e + wh[:, None, None] * (oij_e + cross) \
                    + wl[:, None, None] * oij_p
            # compensated accumulate: acc += (t_p, t_e)
            s, e1 = two_sum(acc_h, t_p)
            acc_l = acc_l + (e1 + t_e)
            return (s, acc_l), None

        if shared:
            # scan over the m axis: Gh [m, nz] -> per-step [nz]
            xs = (Gh, Gl, jnp.moveaxis(Wh, 1, 0), jnp.moveaxis(Wl, 1, 0))
        else:
            xs = (jnp.moveaxis(Gh, 1, 0), jnp.moveaxis(Gl, 1, 0),
                  jnp.moveaxis(Wh, 1, 0), jnp.moveaxis(Wl, 1, 0))
        acc0 = (jnp.zeros((B, nz, nz), f32), jnp.zeros((B, nz, nz), f32))
        (h, l), _ = jax.lax.scan(body, acc0, xs)
        return h.astype(f64) + l.astype(f64)

    def df32():
        return df32_gram(GsZ, D[:, :m_si]) + df32_gram(GdZ, D[:, m_si:])

    def df32_gram_chunked(G, Dw, ch=8):
        """Same as df32_gram but the scan advances ch m-rows per step
        with an unrolled compensated-accumulation chain inside the body
        (fewer scan steps -> less sequential latency)."""
        mm = G.shape[-2]
        pad = (-mm) % ch
        if pad:
            zshape = (pad, nz) if G.ndim == 2 else (B, pad, nz)
            G = jnp.concatenate([G, jnp.zeros(zshape, f64)], axis=-2)
            Dw = jnp.concatenate([Dw, jnp.zeros((B, pad), f64)], axis=1)
        Gh, Gl = split64(G)
        Wh, Wl = split64(Dw)
        shared = G.ndim == 2
        steps = (mm + pad) // ch

        def body(carry, inputs):
            acc_h, acc_l = carry
            ghc, glc, whc, wlc = inputs
            for k in range(ch):
                if shared:
                    gh, gl = ghc[k], glc[k]
                    wh, wl = whc[k], wlc[k]
                    oij_p, oij_e = two_prod(gh[:, None], gh[None, :])
                    cross = gh[:, None] * gl[None, :] + gl[:, None] * gh[None, :]
                    t_p, t_e = two_prod(wh[:, None, None], oij_p[None])
                    t_e = t_e + wh[:, None, None] * (oij_e + cross)[None] \
                        + wl[:, None, None] * oij_p[None]
                else:
                    gh, gl = ghc[:, k], glc[:, k]
                    wh, wl = whc[k], wlc[k]
                    oij_p, oij_e = two_prod(gh[:, :, None], gh[:, None, :])
                    cross = gh[:, :, None] * gl[:, None, :] \
                        + gl[:, :, None] * gh[:, None, :]
                    t_p, t_e = two_prod(wh[:, None, None], oij_p)
                    t_e = t_e + wh[:, None, None] * (oij_e + cross) \
                        + wl[:, None, None] * oij_p
                s, e1 = two_sum(acc_h, t_p)
                acc_l = acc_l + (e1 + t_e)
                acc_h = s
            return (acc_h, acc_l), None

        if shared:
            xs = (Gh.reshape(steps, ch, nz), Gl.reshape(steps, ch, nz),
                  jnp.moveaxis(Wh, 1, 0).reshape(steps, ch, B),
                  jnp.moveaxis(Wl, 1, 0).reshape(steps, ch, B))
        else:
            xs = (jnp.moveaxis(Gh, 1, 0).reshape(steps, ch, B, nz)
                  .transpose(0, 2, 1, 3),
                  jnp.moveaxis(Gl, 1, 0).reshape(steps, ch, B, nz)
                  .transpose(0, 2, 1, 3),
                  jnp.moveaxis(Wh, 1, 0).reshape(steps, ch, B),
                  jnp.moveaxis(Wl, 1, 0).reshape(steps, ch, B))
        acc0 = (jnp.zeros((B, nz, nz), f32), jnp.zeros((B, nz, nz), f32))
        (h, l), _ = jax.lax.scan(body, acc0, xs)
        return h.astype(f64) + l.astype(f64)

    def df32c():
        return df32_gram_chunked(GsZ, D[:, :m_si]) \
            + df32_gram_chunked(GdZ, D[:, m_si:])

    H_ref = jax.jit(ref)()
    jax.block_until_ready(H_ref)
    H_new = jax.jit(df32)()
    jax.block_until_ready(H_new)

    scale = jnp.max(jnp.abs(H_ref), axis=(1, 2), keepdims=True)
    rel = float(jnp.max(jnp.abs(H_new - H_ref) / scale))
    print(f"max relative error vs emulated f64: {rel:.2e}", flush=True)

    # ---- flat-layout variant: [B, n_pairs] lanes instead of [B,19,19]
    # tiles (a [19,19] tile pads to 24x128 on the VPU = 15.5x waste; a
    # flat 190-lane row pads to 256 = 1.3x). Symmetry: only i<=j pairs.
    iu = np.triu_indices(nz)
    II = jnp.asarray(iu[0]); JJ = jnp.asarray(iu[1])
    n_pairs = II.shape[0]

    def df32_flat(G, Dw):
        Gh, Gl = split64(G)
        Wh, Wl = split64(Dw)
        shared = G.ndim == 2

        def body(carry, inputs):
            acc_h, acc_l = carry
            gh, gl, wh, wl = inputs
            if shared:
                gi_h, gj_h = gh[II][None], gh[JJ][None]     # [1, P]
                gi_l, gj_l = gl[II][None], gl[JJ][None]
            else:
                gi_h, gj_h = gh[:, II], gh[:, JJ]           # [B, P]
                gi_l, gj_l = gl[:, II], gl[:, JJ]
            oij_p, oij_e = two_prod(gi_h, gj_h)
            cross = gi_h * gj_l + gi_l * gj_h
            t_p, t_e = two_prod(wh[:, None], oij_p)
            t_e = t_e + wh[:, None] * (oij_e + cross) + wl[:, None] * oij_p
            s, e1 = two_sum(acc_h, t_p)
            return (s, acc_l + (e1 + t_e)), None

        if shared:
            xs = (Gh, Gl, jnp.moveaxis(Wh, 1, 0), jnp.moveaxis(Wl, 1, 0))
        else:
            xs = (jnp.moveaxis(Gh, 1, 0), jnp.moveaxis(Gl, 1, 0),
                  jnp.moveaxis(Wh, 1, 0), jnp.moveaxis(Wl, 1, 0))
        acc0 = (jnp.zeros((B, n_pairs), f32), jnp.zeros((B, n_pairs), f32))
        (h, l), _ = jax.lax.scan(body, acc0, xs)
        return h.astype(f64) + l.astype(f64)

    def unflatten(Hp):
        Hfull = jnp.zeros((B, nz, nz), f64)
        Hfull = Hfull.at[:, II, JJ].set(Hp)
        return jnp.where(jnp.eye(nz, dtype=bool)[None], Hfull,
                         Hfull + jnp.swapaxes(Hfull, 1, 2))

    def df32f():
        Hp = df32_flat(GsZ, D[:, :m_si]) + df32_flat(GdZ, D[:, m_si:])
        return unflatten(Hp)

    H_c = jax.jit(df32c)()
    relc = float(jnp.max(jnp.abs(H_c - H_ref) / scale))
    print(f"chunked df32 rel error: {relc:.2e}", flush=True)
    H_f = jax.jit(df32f)()
    relf = float(jnp.max(jnp.abs(H_f - H_ref) / scale))
    print(f"flat df32 rel error: {relf:.2e}", flush=True)

    for name, fn in (("xla f64 einsum", ref), ("df32 gram", df32),
                     ("df32 chunked", df32c), ("df32 flat", df32f)):
        f = jax.jit(fn)
        o = f(); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(5):
            o = f(); jax.block_until_ready(o)
        print(f"{name:18s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
