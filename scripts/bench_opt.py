"""Isolated optimizer-step bench: optax chain vs fused Pallas AdamW+EMA."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")
from slim_switch_moe_vit_tpu import optim

K = 50


def main():
    rs = np.random.RandomState(0)
    # realistic flagship-scale tree: 12 x (8,384,1536)+(8,1536,384) expert
    # weights + some dense leaves ~= 118M params
    params = {}
    for i in range(12):
        params[f"b{i}"] = {
            "expert_fc1_kernel": jnp.asarray(rs.randn(8, 384, 1536) * .02, jnp.float32),
            "expert_fc2_kernel": jnp.asarray(rs.randn(8, 1536, 384) * .02, jnp.float32),
            "qkv_kernel": jnp.asarray(rs.randn(384, 1152) * .02, jnp.float32),
            "proj_kernel": jnp.asarray(rs.randn(384, 384) * .02, jnp.float32),
        }
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n/1e6:.1f}M")

    opt_init, update = optim.make_optimizer(params, weight_decay=0.05)
    grads = jax.tree.map(lambda p: p * 0.01, params)
    lr = jnp.float32(1e-3)
    decay = 0.99996

    def run_optax(params, s, ema, grads):
        def body(c, _):
            p, s, e = c
            upd, s = update(grads, s, p, lr, lr)
            p = optax.apply_updates(p, upd)
            e = jax.tree.map(lambda a, b: a * decay + b * (1 - decay), e, p)
            return (p, s, e), jnp.float32(0)
        (p, s, e), _ = jax.lax.scan(body, (params, s, ema), None, length=K)
        return jax.tree.leaves(p)[0].ravel()[0]

    def run_fused(params, s, ema, grads):
        def body(c, _):
            p, s, e = c
            p, s, e = update.fused_apply(p, grads, s, e, lr, lr, decay)
            return (p, s, e), jnp.float32(0)
        (p, s, e), _ = jax.lax.scan(body, (params, s, ema), None, length=K)
        return jax.tree.leaves(p)[0].ravel()[0]

    # --- simulated packed-small-leaves variant: small leaves' p/mu/nu/ema
    # live as ONE flat f32 vector; per step the small grads are packed, one
    # flat fused elementwise updates everything, p is unpacked back to leaves
    # for the (simulated) model apply. Measures whether per-leaf op overhead
    # (~0.1 ms per small fusion in the flagship profile) is recoverable.
    BIG = 1 << 22
    small_keys = [(k, sk) for k in params for sk in params[k]
                  if params[k][sk].size < BIG]
    sizes = [int(params[k][sk].size) for k, sk in small_keys]
    offs = np.cumsum([0] + sizes)
    P = int(offs[-1])
    print(f"small leaves: {len(sizes)} totalling {P/1e6:.1f}M params")

    def pack(tree):
        return jnp.concatenate([tree[k][sk].ravel() for k, sk in small_keys])

    def unpack_into(tree, flat):
        out = {k: dict(v) for k, v in tree.items()}
        for (k, sk), o, sz in zip(small_keys, offs[:-1], sizes):
            out[k][sk] = flat[o:o + sz].reshape(tree[k][sk].shape)
        return out

    def run_packed(params, flat_state, grads):
        pf0, mu0, nu0, ema0 = flat_state
        big = {k: {sk: v for sk, v in params[k].items() if v.size >= BIG}
               for k in params}

        def body(c, _):
            big_p, pf, mu, nu, ema = c
            gf = pack(grads)
            mu = 0.9 * mu + 0.1 * gf
            nu = 0.999 * nu + 0.001 * gf * gf
            u = mu / (jnp.sqrt(nu) + 1e-8) + 0.05 * pf
            pf = pf - lr * u
            ema = ema * decay + pf * (1 - decay)
            # big leaves: plain per-leaf math (2 per block, at HBM floor)
            big_p = jax.tree.map(lambda p, g: p - lr * g, big_p,
                                 {k: {sk: grads[k][sk] for sk in big_p[k]}
                                  for k in big_p})
            # unpack p for the model apply (the real cost of keeping state flat)
            leaves = unpack_into(params, pf)
            probe = sum(leaves[k][sk].ravel()[0]
                        for k, sk in small_keys[:1])
            return (big_p, pf, mu, nu, ema), probe
        c, outs = jax.lax.scan(body, (big, pf0, mu0, nu0, ema0), None,
                               length=K)
        return outs[-1]

    pf = pack(params)
    flat_state = (pf, jnp.zeros_like(pf), jnp.zeros_like(pf), jnp.copy(pf))
    fpk = jax.jit(run_packed, donate_argnums=(1,))
    _ = float(fpk(params, flat_state, grads))
    flat_state = (pf, jnp.zeros_like(pf), jnp.zeros_like(pf), jnp.copy(pf))
    t0 = time.perf_counter()
    _ = float(fpk(params, flat_state, grads))
    print(f"packed-smalls cycle (pack g + flat update + unpack p): "
          f"{(time.perf_counter() - t0) / K * 1000:7.3f} ms/step")

    for name, fn in (("optax", run_optax), ("fused", run_fused)):
        s = opt_init(params)
        ema = jax.tree.map(jnp.copy, params)
        f = jax.jit(fn, donate_argnums=(0, 1, 2))
        _ = float(f(jax.tree.map(jnp.copy, params), s, ema, grads))
        s = opt_init(params)
        ema = jax.tree.map(jnp.copy, params)
        t0 = time.perf_counter()
        _ = float(f(jax.tree.map(jnp.copy, params), s, ema, grads))
        dt = (time.perf_counter() - t0) / K * 1000
        gb = n * 4 * 9 / 1e9
        print(f"{name:6s} {dt:7.3f} ms/step   ({gb / (dt/1000):.0f} GB/s "
              f"effective at 9 passes)")


if __name__ == "__main__":
    main()
