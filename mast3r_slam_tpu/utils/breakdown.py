"""Per-block network timing breakdown (reference profiler parity).

The fork instruments the vendored CroCo blocks with host timers
(`/root/reference/thirdparty/.../blocks.py:130-134,191-197,235`) and prints
a PatchEmbed / Encoder_attn / Encoder_mlp / Decoder_attn /
Decoder_cross_attn / Decoder_mlp summary (`profiler.py:37-110`).  Under
XLA the whole forward is one fused program, so per-block host timers would
both lie and destroy fusion; instead each sub-block is timed as its own
chained jitted program (N data-dependent repetitions in one fori_loop —
the relay-proof methodology of bench.py) and the totals are synthesized
from the model's static call counts (enc_depth blocks/frame; 2 x dec_depth
decoder blocks per two-view decode).
"""

from __future__ import annotations

import time


def _timed_chain(fn, params, carry, n, readback):
    import jax

    def chained(k):
        @jax.jit
        def f(params, carry):
            def body(i, c):
                return fn(params, c)
            c = jax.lax.fori_loop(0, k, body, carry)
            return readback(c)
        return f

    f1, fN = chained(1), chained(n)
    float(f1(params, carry))
    float(fN(params, carry))
    t0 = time.perf_counter()
    float(f1(params, carry))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fN(params, carry))
    tN = time.perf_counter() - t0
    return max((tN - t1) / (n - 1), 0.0)


def network_breakdown(cfg, params, img_hw, n_chain: int = 8) -> dict:
    """Measure per-sub-block latency and synthesize per-frame totals.

    Returns {section: seconds-per-frame} for the reference taxonomy keys.
    ``params`` is the full model params dict; ``cfg`` a MASt3RConfig.
    """
    import jax
    import jax.numpy as jnp

    from ..models.mast3r import (
        CrossAttention, Mlp, PatchEmbed, SelfAttention,
    )

    h, w = img_hw
    p = cfg.patch_size
    N = (h // p) * (w // p)
    E, D = cfg.enc_embed_dim, cfg.dec_embed_dim
    key = jax.random.PRNGKey(0)
    P = params["params"]

    yy, xx = jnp.meshgrid(jnp.arange(h // p), jnp.arange(w // p),
                          indexing="ij")
    pos = jnp.stack([yy, xx], -1).reshape(1, N, 2).astype(jnp.int32)

    img = jax.random.normal(key, (1, h, w, 3), jnp.float32)
    xe = jax.random.normal(key, (1, N, E), jnp.float32)
    xd = jax.random.normal(key, (1, N, D), jnp.float32)

    def chain_on(module, sub_params, x, *extra):
        def step(prm, c):
            out = module.apply({"params": prm}, c, *extra)
            out = out[0] if isinstance(out, tuple) else out
            return (c + 1e-12 * out.reshape(-1)[0].astype(c.dtype)
                    if out.shape != c.shape else out.astype(c.dtype))
        return _timed_chain(step, sub_params, x, n_chain,
                            lambda c: c.reshape(-1)[0].astype(jnp.float32))

    res = {}
    pe = PatchEmbed(p, E, cfg.dtype)
    res["PatchEmbed"] = chain_on(pe, P["patch_embed"], img)

    attn = SelfAttention(E, cfg.enc_num_heads, cfg.rope_freq, cfg.dtype)
    blk_attn = chain_on(attn, P["enc_block_0"]["attn"], xe, pos)
    mlp = Mlp(E * cfg.mlp_ratio, E, cfg.dtype)
    blk_mlp = chain_on(mlp, P["enc_block_0"]["mlp"], xe)
    res["Encoder_attn"] = blk_attn * cfg.enc_depth
    res["Encoder_mlp"] = blk_mlp * cfg.enc_depth

    dattn = SelfAttention(D, cfg.dec_num_heads, cfg.rope_freq, cfg.dtype)
    d_attn = chain_on(dattn, P["dec_block_0"]["attn"], xd, pos)
    dmlp = Mlp(D * cfg.mlp_ratio, D, cfg.dtype)
    d_mlp = chain_on(dmlp, P["dec_block_0"]["mlp"], xd)

    cross = CrossAttention(D, cfg.dec_num_heads, cfg.rope_freq, cfg.dtype)

    def cross_step(prm, c):
        out = cross.apply({"params": prm}, c, xd, xd, pos, pos)
        return out.astype(c.dtype)

    d_cross = _timed_chain(cross_step, P["dec_block_0"]["cross_attn"], xd,
                           n_chain,
                           lambda c: c.reshape(-1)[0].astype(jnp.float32))

    # a tracked frame decodes TWO views through dec_depth blocks each
    # (mast3r_utils.py:60-66 decoder(): dec_blocks + dec_blocks2)
    res["Decoder_attn"] = d_attn * cfg.dec_depth * 2
    res["Decoder_cross_attn"] = d_cross * cfg.dec_depth * 2
    res["Decoder_mlp"] = d_mlp * cfg.dec_depth * 2
    return res


def print_network_summary(res: dict, extra: dict | None = None):
    """Reference-style report (profiler.py:37-110 shape): per-component
    table, encoder-vs-decoder split, internal attn/MLP breakdowns."""
    t_patch = res.get("PatchEmbed", 0.0)
    t_ea, t_em = res.get("Encoder_attn", 0.0), res.get("Encoder_mlp", 0.0)
    t_da = res.get("Decoder_attn", 0.0)
    t_dc = res.get("Decoder_cross_attn", 0.0)
    t_dm = res.get("Decoder_mlp", 0.0)
    t_enc, t_dec = t_ea + t_em, t_da + t_dc + t_dm
    vit = t_patch + t_enc + t_dec

    print("\n" + "=" * 50)
    print("NETWORK TIMING BREAKDOWN (per tracked frame)")
    print("=" * 50)
    print(f"ViT total: {vit * 1e3:.2f} ms")
    for k in ("PatchEmbed", "Encoder_attn", "Encoder_mlp", "Decoder_attn",
              "Decoder_cross_attn", "Decoder_mlp"):
        if k in res:
            print(f"  - {k}: {res[k] * 1e3:.2f} ms")
    eps = 1e-12
    print("\nEncoder vs Decoder:")
    print(f"  - Encoder: {t_enc * 1e3:.2f} ms "
          f"({100 * t_enc / max(t_enc + t_dec, eps):.1f}%)")
    print(f"  - Decoder: {t_dec * 1e3:.2f} ms "
          f"({100 * t_dec / max(t_enc + t_dec, eps):.1f}%)")
    print("\nEncoder internal:")
    print(f"  - Attention: {t_ea * 1e3:.2f} ms "
          f"({100 * t_ea / max(t_enc, eps):.1f}%)")
    print(f"  - MLP: {t_em * 1e3:.2f} ms ({100 * t_em / max(t_enc, eps):.1f}%)")
    print("\nDecoder internal:")
    print(f"  - Self-Attn: {t_da * 1e3:.2f} ms "
          f"({100 * t_da / max(t_dec, eps):.1f}%)")
    print(f"  - Cross-Attn: {t_dc * 1e3:.2f} ms "
          f"({100 * t_dc / max(t_dec, eps):.1f}%)")
    print(f"  - MLP: {t_dm * 1e3:.2f} ms ({100 * t_dm / max(t_dec, eps):.1f}%)")
    if extra:
        print()
        for k, v in extra.items():
            print(f"{k}: {v}")
    print("=" * 50 + "\n")
