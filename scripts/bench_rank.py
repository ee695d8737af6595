"""Micro-bench: counting-sort rank layouts for the MoE dispatch.

Compares the (TK, E) chunked-cumsum rank (lanes=E=8, 1/16 lane utilization)
against a lane-major variant that puts chunk on sublanes and (nc*E) on lanes.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def rank_current(flat_e, E):
    from slim_switch_moe_vit_tpu.ops.moe import _rank_in_expert
    return _rank_in_expert(flat_e, E)


def rank_lanes(flat_e, E, chunk=256):
    TK = flat_e.shape[0]
    pad = (-TK) % chunk
    fe = jnp.pad(flat_e, (0, pad), constant_values=E)
    nc = fe.shape[0] // chunk
    fe2 = fe.reshape(nc, chunk).T                        # (chunk, nc)
    oh = (fe2[:, :, None] == jnp.arange(E, dtype=fe.dtype)).astype(jnp.int32)
    ohf = oh.reshape(chunk, nc * E)
    within = jnp.cumsum(ohf, axis=0)                     # full-lane cumsum
    tot = within[-1].reshape(nc, E)
    off = jnp.cumsum(tot, axis=0) - tot                  # (nc, E) tiny
    pos = (within - ohf).reshape(chunk, nc, E) + off[None]
    rank2 = jnp.sum(pos * oh, axis=2)                    # (chunk, nc)
    rank = rank2.T.reshape(-1)[:TK]
    return rank, jnp.sum(tot, axis=0)


def main():
    T, k, E = 25216, 2, 8
    rs = np.random.RandomState(0)
    flat = jnp.asarray(rs.randint(0, E, T * k), jnp.int32)

    fns = {"current": jax.jit(lambda f: rank_current(f, E)),
           "lanes": jax.jit(lambda f: rank_lanes(f, E))}
    outs = {}
    for name, fn in fns.items():
        r, g = fn(flat)
        outs[name] = (np.asarray(r), np.asarray(g))
        K = 50
        t0 = time.perf_counter()
        for _ in range(K):
            r, g = fn(flat)
        _ = float(r[0]) + float(g[0])
        dt = (time.perf_counter() - t0) / K
        print(f"{name}: {dt*1e3:.3f} ms")
    assert (outs["current"][0] == outs["lanes"][0]).all()
    assert (outs["current"][1] == outs["lanes"][1]).all()
    print("outputs match")


if __name__ == "__main__":
    main()
