"""Switch/MoE dispatch — the TPU-native replacement for FastMoE's CUDA kernels.

The reference imports FastMoE (``models/resMoE.py:6``), whose native surface is:
expert-index counting + token scatter/gather reorder CUDA kernels, batched
per-expert GEMMs, and an NCCL all_to_all for expert parallelism. Here the same
capability is built the TPU way:

- **Gate** (``naive_topk_gate``): linear router → top-k → softmax over the k
  selected scores. This matches FastMoE's ``NaiveGate`` (top-2 by default in the
  reference, ``models/resMoE.py:178-184``): softmax is applied *after* top-k
  selection, over the selected logits.
- **Dispatch** (``make_dispatch``): FastMoE is dropless (dynamic per-expert
  counts). XLA requires static shapes, so each expert gets a static
  ``capacity`` slot buffer; position-in-expert comes from a cumsum over the
  one-hot expert assignment, tokens beyond capacity are dropped (their combine
  weight is zero). With ``capacity_factor >= num_experts/k`` nothing can drop
  and the math equals the dropless reference exactly.
- **Expert FFN** (``grouped_ffn``): one batched einsum ``(E,C,d)@(E,d,h)`` —
  a grouped GEMM that tiles directly onto the MXU.
- **Combine**: gather each token's k expert outputs and sum with gate weights.
- **Expert parallelism**: expert-sharded weights + a sharding constraint on the
  dispatch buffer let XLA insert the all_to_all over ICI (see
  ``parallel/sharding.py``) — the NCCL-free equivalent of FastMoE's global
  exchange.

An exact dense reference path (``moe_dense``) computes every expert for every
token; it is O(E) more compute and exists for golden-value tests only.
"""
from __future__ import annotations

import os
import typing as typ
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fused_ffn import gelu_fast


def _gather_in_kernel() -> bool:
    """Opt-in (SSMV_GATHER_IN_KERNEL=1): fold the dispatch row gather into
    the fused FFN kernel's x load (fused_ffn.fused_expert_ffn_gather).
    Env-read at trace time so bench.py can flip it without plumbing."""
    return os.environ.get("SSMV_GATHER_IN_KERNEL", "0") == "1"


def naive_topk_gate(logits: jnp.ndarray, top_k: int):
    """FastMoE NaiveGate: select top-k experts, softmax over the k scores.

    Small k is selected by repeated argmax instead of ``lax.top_k`` — top_k
    lowers to a sort on TPU (~4 ms/step at 12 blocks); k rounds of
    max/argmax/mask are pure VPU reductions with identical tie-breaking
    (first index wins).

    Args:
        logits: (T, E) router scores.
        top_k: number of experts per token.
    Returns:
        gate_weights: (T, k) fp32 combine weights (softmax over selected scores).
        expert_idx:   (T, k) int32 selected expert ids.
    """
    lg = logits.astype(jnp.float32)
    if top_k <= 4:
        vals, idxs = [], []
        cur = lg
        for _ in range(top_k):
            i = jnp.argmax(cur, axis=-1)
            vals.append(jnp.max(cur, axis=-1))
            idxs.append(i.astype(jnp.int32))
            cur = jnp.where(jax.nn.one_hot(i, lg.shape[-1], dtype=jnp.bool_),
                            -jnp.inf, cur)
        vals = jnp.stack(vals, axis=-1)
        idx = jnp.stack(idxs, axis=-1)
    else:
        vals, idx = jax.lax.top_k(lg, top_k)
    weights = jax.nn.softmax(vals, axis=-1)
    return weights, idx.astype(jnp.int32)


def load_balance_loss(logits: jnp.ndarray, expert_idx: jnp.ndarray, num_experts: int):
    """Switch-transformer auxiliary load-balance loss: E * sum_e f_e * P_e.

    f_e = fraction of tokens whose top-1 choice is expert e;
    P_e = mean router probability for expert e.
    Not present in FastMoE's naive gate (coefficient defaults to 0 for parity).
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # (T, E)
    top1 = expert_idx[:, 0]
    f = jnp.mean(jax.nn.one_hot(top1, num_experts, dtype=jnp.float32), axis=0)
    p = jnp.mean(probs, axis=0)
    return num_experts * jnp.sum(f * p)


def compute_capacity(tokens: int, num_experts: int, top_k: int,
                     capacity_factor: float, multiple: int = 8) -> int:
    """Static per-expert slot count. Rounded up to a tiling-friendly multiple."""
    cap = int(tokens * top_k * capacity_factor / num_experts) + 1
    cap = min(cap, tokens)  # an expert can never receive more than all tokens
    return ((cap + multiple - 1) // multiple) * multiple


def make_dispatch(expert_idx: jnp.ndarray, num_experts: int, capacity: int):
    """Compute scatter destinations for each (token, choice) pair.

    Args:
        expert_idx: (T, k) int32.
    Returns:
        dest: (T, k) int32 flat position in the (E*C,) dispatch buffer, or
              E*C (a dump slot) for tokens over capacity.
        keep: (T, k) bool — False where the token was dropped.

    Priority is token order (FastMoE processes tokens in order; earlier tokens
    win slots), and within a token, choice order.
    """
    T, k = expert_idx.shape
    flat = expert_idx.reshape(-1)  # (T*k,) in token-major order
    onehot = jax.nn.one_hot(flat, num_experts, dtype=jnp.int32)  # (T*k, E)
    # position of each pair within its expert = exclusive cumsum of its one-hot
    pos_all = jnp.cumsum(onehot, axis=0) - onehot  # (T*k, E)
    pos = jnp.take_along_axis(pos_all, flat[:, None], axis=1)[:, 0]  # (T*k,)
    keep = pos < capacity
    dest = jnp.where(keep, flat * capacity + pos, num_experts * capacity)
    return dest.reshape(T, k), keep.reshape(T, k)


def dispatch_tokens(x: jnp.ndarray, dest: jnp.ndarray, num_experts: int,
                    capacity: int) -> jnp.ndarray:
    """Scatter tokens into the per-expert buffer.

    Args:
        x: (T, d) tokens.  dest: (T, k) flat destinations.
    Returns:
        buf: (E, C, d) — one padded row of token copies per expert.
    """
    T, d = x.shape
    k = dest.shape[1]
    buf = jnp.zeros((num_experts * capacity + 1, d), dtype=x.dtype)
    # token-major scatter; duplicate dests only hit the dump slot (E*C).
    src = jnp.repeat(x, k, axis=0) if k > 1 else x
    buf = buf.at[dest.reshape(-1)].set(src, mode="drop")
    return buf[:-1].reshape(num_experts, capacity, d)


def combine_tokens(expert_out: jnp.ndarray, dest: jnp.ndarray, keep: jnp.ndarray,
                   gate_weights: jnp.ndarray) -> jnp.ndarray:
    """Gather expert outputs back to token order and mix with gate weights.

    Args:
        expert_out: (E, C, d).  dest/keep/gate_weights: (T, k).
    Returns:
        y: (T, d) = sum_k gate_k * expert_out[dest_k]  (0 for dropped slots).
    """
    E, C, d = expert_out.shape
    flat = expert_out.reshape(E * C, d)
    flat = jnp.concatenate([flat, jnp.zeros((1, d), flat.dtype)], axis=0)
    gathered = flat[dest]  # (T, k, d)
    w = (gate_weights * keep.astype(gate_weights.dtype)).astype(gathered.dtype)
    return jnp.einsum("tkd,tk->td", gathered, w)


def grouped_ffn(buf: jnp.ndarray, w1, b1, w2, b2,
                activation: typ.Callable = partial(jax.nn.gelu, approximate=False),
                dropout_rng=None, drop_rate: float = 0.0) -> jnp.ndarray:
    """Per-expert FFN as grouped GEMMs.

    buf: (E, C, d); w1: (E, d, h); b1: (E, h); w2: (E, h, d); b2: (E, d).
    The reference's expert is Linear→GELU→Dropout→Linear (``resMoE.py:25``,
    FastMoE ``FMoETransformerMLP`` experts).
    """
    h = jnp.einsum("ecd,edh->ech", buf, w1.astype(buf.dtype),
                   preferred_element_type=jnp.float32)
    h = h + b1[:, None, :]
    h = activation(h)
    if dropout_rng is not None and drop_rate > 0.0:
        mask = jax.random.bernoulli(dropout_rng, 1.0 - drop_rate, h.shape)
        h = jnp.where(mask, h / (1.0 - drop_rate), 0.0)
    h = h.astype(buf.dtype)
    y = jnp.einsum("ech,ehd->ecd", h, w2.astype(buf.dtype),
                   preferred_element_type=jnp.float32)
    y = y + b2[:, None, :]
    return y.astype(buf.dtype)


def moe_forward(x: jnp.ndarray, router_w, router_b, w1, b1, w2, b2, *,
                top_k: int = 2, capacity_factor: float = 2.0,
                capacity: typ.Optional[int] = None,
                activation: typ.Callable = partial(jax.nn.gelu, approximate=False),
                dropout_rng=None, drop_rate: float = 0.0,
                shard_buf: typ.Callable = lambda b: b):
    """Full MoE MLP over a flat token batch.

    Args:
        x: (T, d). router_w: (d, E). Experts: w1 (E,d,h), etc.
        shard_buf: hook applying a sharding constraint on the (E, C, d)
            dispatch buffer — under a mesh this makes XLA all_to_all the tokens
            to expert-sharded devices (expert parallelism over ICI).
    Returns:
        y: (T, d), aux: dict of scalars (router logits stats, drop rate).
    """
    T, d = x.shape
    E = w1.shape[0]
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32)) + router_b
    gate_w, expert_idx = naive_topk_gate(logits, top_k)
    if capacity is None:
        capacity = compute_capacity(T, E, top_k, capacity_factor)
    dest, keep = make_dispatch(expert_idx, E, capacity)
    buf = dispatch_tokens(x, dest, E, capacity)
    buf = shard_buf(buf)
    out = grouped_ffn(buf, w1, b1, w2, b2, activation=activation,
                      dropout_rng=dropout_rng, drop_rate=drop_rate)
    out = shard_buf(out)
    y = combine_tokens(out, dest, keep, gate_w)
    aux = {
        "balance_loss": load_balance_loss(logits, expert_idx, E),
        "drop_fraction": 1.0 - jnp.mean(keep.astype(jnp.float32)),
    }
    return y.astype(x.dtype), aux


def moe_forward_ragged(x: jnp.ndarray, router_w, router_b, w1, b1, w2, b2, *,
                       top_k: int = 2,
                       activation: typ.Callable = gelu_fast,
                       dropout_rng=None, drop_rate: float = 0.0):
    """Dropless sort-based MoE — the fast single-chip path.

    Exactly FastMoE's dropless semantics (no capacity, no token dropping) with
    a TPU-native implementation: stable argsort groups the (token, choice)
    pairs by expert, ``lax.ragged_dot`` runs the per-expert GEMMs over the
    ragged groups directly on the MXU, and an inverse-permutation gather
    restores token order. No scatter anywhere — XLA scatters serialize on TPU
    and were the bottleneck of the capacity path single-chip.
    """
    T, d = x.shape
    E = w1.shape[0]
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32)) + router_b
    gate_w, expert_idx = naive_topk_gate(logits, top_k)

    flat_e = expert_idx.reshape(-1)                      # (T*k) token-major
    sort_idx = jnp.argsort(flat_e, stable=True)          # group by expert
    e_sorted = flat_e[sort_idx]
    xs = jnp.take(x, sort_idx // top_k, axis=0)          # (T*k, d) gather
    onehot_sorted = jax.nn.one_hot(e_sorted, E, dtype=xs.dtype)  # (T*k, E)
    group_sizes = jnp.sum(
        jax.nn.one_hot(flat_e, E, dtype=jnp.int32), axis=0)

    # bias-add as a one-hot matmul: its transpose (the bias gradient) is then
    # onehot^T @ dh — an MXU GEMM. A direct b[e_sorted] gather makes XLA lower
    # the bias grad as a 50k-row segment-sum (~20ms/step at ViT-tiny/b128).
    h = jax.lax.ragged_dot(xs, w1.astype(xs.dtype), group_sizes,
                           preferred_element_type=xs.dtype)
    h = h + jnp.dot(onehot_sorted, b1.astype(xs.dtype),
                    preferred_element_type=xs.dtype)
    h = activation(h)
    if dropout_rng is not None and drop_rate > 0.0:
        mask = jax.random.bernoulli(dropout_rng, 1.0 - drop_rate, h.shape)
        h = jnp.where(mask, h / (1.0 - drop_rate), 0.0)
    h = h.astype(xs.dtype)
    out = jax.lax.ragged_dot(h, w2.astype(xs.dtype), group_sizes,
                             preferred_element_type=xs.dtype)
    out = out + jnp.dot(onehot_sorted, b2.astype(xs.dtype),
                        preferred_element_type=xs.dtype)

    inv = jnp.argsort(sort_idx).reshape(T, top_k)        # unsort, per choice
    # combine as k separate row-gathers + weighted adds: a (T, k, d) gather +
    # einsum over k tiles as T(2,128) and runs ~3x slower (profiled)
    y = jnp.zeros((T, d), out.dtype)
    for kk in range(top_k):
        yk = jnp.take(out, inv[:, kk], axis=0)
        y = y + yk * gate_w[:, kk:kk + 1].astype(yk.dtype)
    aux = {
        "balance_loss": load_balance_loss(logits, expert_idx, E),
        "drop_fraction": jnp.asarray(0.0, jnp.float32),
    }
    return y.astype(x.dtype), aux


def _rank_in_expert(flat_e: jnp.ndarray, num_experts: int, chunk: int = 256):
    """Per-pair position within its expert group + total group sizes.

    Hierarchical exclusive prefix count in a LANE-MAJOR layout: the naive
    ``cumsum((T*k, E))`` runs on 8 of 128 VPU lanes (E is the minor dim) and
    its scan is 50k long; here the chunk dim rides the sublanes and all
    (n_chunks * E) counters ride the lanes, so the one real cumsum is a
    256-step full-width scan. 16x faster than the chunked (…, E)-minor
    variant on v5e (scripts/bench_rank.py).

    Returns:
        rank: (T*k,) int32 — #earlier pairs choosing the same expert
            (token-major order = FastMoE token priority).
        group_sizes: (E,) int32.
    """
    TK = flat_e.shape[0]
    E = num_experts
    pad = (-TK) % chunk
    fe = jnp.pad(flat_e, (0, pad), constant_values=E)  # pad rows count nowhere
    nc = fe.shape[0] // chunk
    fe2 = fe.reshape(nc, chunk).T                      # (chunk, nc)
    oh = (fe2[:, :, None] == jnp.arange(E, dtype=fe.dtype)).astype(jnp.int32)
    ohf = oh.reshape(chunk, nc * E)
    within = jnp.cumsum(ohf, axis=0)                   # full-lane scan
    tot = within[-1].reshape(nc, E)
    off = jnp.cumsum(tot, axis=0) - tot                # (nc, E), tiny
    pos = (within - ohf).reshape(chunk, nc, E) + off[None]
    rank2 = jnp.sum(pos * oh, axis=2)                  # select own-expert lane
    rank = rank2.T.reshape(-1)[:TK]
    return rank, jnp.sum(tot, axis=0)



def capacity_region_rows(capacity: int, tile: int) -> int:
    """Rows of each expert's static padded region in a capacity layout:
    roundup(capacity+1, tile) — the +1 reserves the always-padding final
    slot dropped pairs point at. The ONE definition shared by
    aligned_expert_layout and both shard_map EP forms, whose exchange
    reshapes must match the layout exactly."""
    return ((capacity + 1 + tile - 1) // tile) * tile


# Minimum T*k at which the 512-row dropless layout's fixed padding
# (E * (LAYOUT_ROWS - TILE_ROWS) rows) has diluted enough for the faster
# 512-row backward to win end-to-end (the per-row dw win is constant,
# the padding cost is ~E*256/TK). Measured on v5e (r5 sweep,
# scripts/bench_batch_scaling.py, ViT-S/16 Switch-8E 224px bf16):
# b128 TK=50,432: 256 wins 1539.9 vs 1534.8 img/s (-0.33% for 512)
# b256 TK=100,864: 256 wins 1453.3 vs 1436.6 (-1.15%)
# b512 TK=201,728: 512 wins 1361.8 vs 1348.2 (+1.00%)
# -> crossover between b256 and b512; threshold set mid-gap. Full table in
# PARITY.md "batch scaling".
_LAYOUT_512_MIN_TK = 150_000


def layout_rows_policy(tk: int, num_experts: int) -> int:
    """Dropless layout alignment for ``tk = T * top_k`` dispatched rows.

    ``SSMV_LAYOUT_ROWS={256,512}`` overrides (A/B knob); ``auto``/unset
    applies the measured policy above. Resolved at trace time — a Python
    int, never a tracer."""
    from .fused_ffn import LAYOUT_ROWS, TILE_ROWS

    env = os.environ.get("SSMV_LAYOUT_ROWS", "auto")
    if env not in ("", "auto", "0"):
        rows = int(env)
        if rows not in (TILE_ROWS, LAYOUT_ROWS):
            raise ValueError(
                f"SSMV_LAYOUT_ROWS={rows} not in ({TILE_ROWS}, {LAYOUT_ROWS})")
        return rows
    del num_experts  # the threshold already prices E=8's fixed padding
    return LAYOUT_ROWS if tk >= _LAYOUT_512_MIN_TK else TILE_ROWS


def aligned_expert_layout(expert_idx: jnp.ndarray, num_experts: int,
                          tile: int = None, gate_w: jnp.ndarray = None,
                          weight_dtype=jnp.bfloat16,
                          capacity: typ.Optional[int] = None):
    """Sort (token, choice) pairs by expert with TILE-aligned group starts.

    The fused Pallas FFN (``ops.fused_ffn``) requires every ``tile``-row block
    to belong to exactly one expert. This computes a padded layout of static
    size ``Tp = roundup(T*k, tile) + E*tile`` (each group's padding < tile)
    where expert groups are contiguous and tile-aligned.

    With ``capacity`` set, each expert's region is instead a STATIC
    ``Cp = roundup(capacity+1, tile)`` rows (so the last slot is always
    padding — dropped pairs point there) and pairs ranked at or beyond
    ``capacity`` are dropped: their slot holds no pair and their combine
    weight is zero. Token-major rank = FastMoE token priority, matching the
    scatter-based capacity path exactly.

    Returns:
        gather_idx: (Tp,) int32 — source token for each padded slot (pad slots
            point at token 0; their outputs are never read and their
            cotangents are zero, so the value is irrelevant).
        pair_slot: (T, k) int32 — padded slot of each (token, choice) pair
            (dropped pairs point at the final, always-padding slot).
        e_of_tile: (Tp // tile,) int32 — owning expert of each row tile.
        w_slot: (Tp,) weight_dtype — combine weight of each slot (0 at
            padding), or None when gate_w is not given.
        keep: (T, k) bool — False where the pair was capacity-dropped
            (all-True when capacity is None).
    """
    if tile is None:
        from .fused_ffn import TILE_ROWS as tile
    T, k = expert_idx.shape
    TK = T * k
    E = num_experts

    flat = expert_idx.reshape(-1)
    # counting-sort ranking instead of argsort (the sort was ~1 ms/block):
    # rank = how many earlier pairs chose the same expert. Token-major order
    # gives FastMoE's token-priority semantics, same as a stable sort.
    rank, group_sizes = _rank_in_expert(flat, E)
    if capacity is not None:
        Cp = capacity_region_rows(capacity, tile)  # last slot = pad
        Tp = E * Cp
        n_tiles = Tp // tile
        keep = rank < capacity
        slot_pair = jnp.where(keep, flat * Cp + rank, Tp - 1)
        pair_slot = slot_pair
        e_of_tile_np = np.repeat(np.arange(E, dtype=np.int32), Cp // tile)
    else:
        Tp = ((TK + tile - 1) // tile) * tile + E * tile  # static
        n_tiles = Tp // tile
        keep = jnp.ones((TK,), bool)
        # minimum ONE tile per expert even at zero tokens: the backward
        # kernel writes each expert's dw window only at tiles it owns
        # (ops/fused_ffn.py::_bwd out_specs index on e_of_tile), so an
        # expert absent from e_of_tile would leave its dw output block
        # UNINITIALIZED on real TPU (interpret mode zero-fills and hid
        # this). A pure-padding tile costs nothing extra (Tp already
        # budgets E*tile of alignment slack) and its rows carry zero
        # combine weight, so the extra tile's dw contribution is exactly
        # zero — guarded by tests/test_moe_ops.py::test_zero_token_expert.
        padded_sizes = jnp.maximum(
            ((group_sizes + tile - 1) // tile) * tile, tile)
        padded_starts = jnp.cumsum(padded_sizes) - padded_sizes
        slot_pair = padded_starts[flat] + rank               # (TK,)
        pair_slot = slot_pair
        e_of_tile_np = None
    # The slot table (which pair occupies each padded slot + its combine
    # weight) needs random-access construction. Element scatters/gathers on
    # (Tp,) vectors cost ~0.2-0.4 ms each at this size (profiled: 1-D random
    # access moves a full tile per element), so build the WHOLE table with
    # ONE scatter of packed s32 values: low 16 bits = flat pair index, high
    # 16 bits = the pair's gate weight as bf16 bits. Padding slots keep the
    # init value 0 = (pair 0, weight +0.0) — a zero combine weight is exactly
    # the padding semantics the backward needs. Packing rounds the weight to
    # bf16, so it applies only when the activations are bf16 anyway (the
    # d_out product rounds to bf16 regardless); f32 models take the exact
    # two-scatter path, as does T*k >= 2**16.
    # stop_gradient: w_slot is a backward-only helper (the real gate grad
    # arrives via d_gate); without it autodiff would try to differentiate
    # through the bitcast.
    gate_ng = (None if gate_w is None
               else jax.lax.stop_gradient(gate_w.reshape(-1)))
    # Dropped pairs must not register in the table (their reserved slot Tp-1
    # is real padding): route their scatter out of bounds, mode="drop".
    dest = slot_pair if capacity is None else jnp.where(keep, slot_pair, Tp)
    if (gate_ng is not None and TK < (1 << 16)
            and jnp.dtype(weight_dtype) == jnp.bfloat16):
        gbits = jax.lax.bitcast_convert_type(
            gate_ng.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.int32)
        packed_vals = (gbits << 16) | jnp.arange(TK, dtype=jnp.int32)
        packed = jnp.zeros((Tp,), jnp.int32).at[dest].set(packed_vals,
                                                          mode="drop")
        gather_idx = (packed & 0xFFFF) // k
        w_slot = jax.lax.bitcast_convert_type(
            ((packed >> 16) & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    else:
        pair_of = jnp.zeros((Tp,), jnp.int32).at[dest].set(
            jnp.arange(TK, dtype=jnp.int32), mode="drop")
        gather_idx = pair_of // k
        if gate_ng is not None:
            w_slot = jnp.zeros((Tp,), weight_dtype).at[dest].set(
                gate_ng.astype(weight_dtype), mode="drop")
        else:
            w_slot = None

    if e_of_tile_np is not None:
        e_of_tile = jnp.asarray(e_of_tile_np)
    else:
        tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
        e_of_tile = jnp.clip(
            jnp.searchsorted(padded_starts, tile_starts, side="right") - 1,
            0, E - 1).astype(jnp.int32)
    return (gather_idx, pair_slot.reshape(T, k), e_of_tile, w_slot,
            keep.reshape(T, k))


def _f0(a):
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


@jax.custom_vjp
def _dispatch_gather(x, gather_idx, pair_slot, keep=None):
    """xs[s] = x[gather_idx[s]] — expand tokens into the padded expert layout.

    Custom VJP: the automatic backward of this gather is a 50k-row scatter-add
    into (T, d), which serializes on TPU. Each token owns exactly the k slots
    ``pair_slot[t, :]`` and every other (padding) slot carries a zero cotangent
    through the FFN (its combine weight is zero), so the exact gradient is k
    row GATHERS instead: dx[t] = sum_k dxs[pair_slot[t, k]].
    ``keep`` (capacity mode): dropped pairs point at a padding slot whose
    value is arbitrary — their gathered cotangent is masked to zero.
    """
    return jnp.take(x, gather_idx, axis=0)


def _dispatch_gather_fwd(x, gather_idx, pair_slot, keep=None):
    return jnp.take(x, gather_idx, axis=0), (gather_idx, pair_slot, keep)


def _dispatch_gather_bwd(res, dxs):
    gather_idx, pair_slot, keep = res
    dx = None
    for kk in range(pair_slot.shape[1]):
        g = jnp.take(dxs, pair_slot[:, kk], axis=0)
        if keep is not None:
            g = g * keep[:, kk:kk + 1].astype(g.dtype)
        dx = g if dx is None else dx + g
    return (dx, _f0(gather_idx), _f0(pair_slot),
            None if keep is None else _f0(keep))


_dispatch_gather.defvjp(_dispatch_gather_fwd, _dispatch_gather_bwd)


@jax.custom_vjp
def _combine_slots(out, pair_slot, gate_w, gather_idx, w_slot):
    """y[t] = sum_k gate_w[t,k] * out[pair_slot[t,k]].

    Custom VJP: the automatic backward of the per-choice gathers is k
    scatter-adds into the (Tp, d) buffer (~0.7 ms each). Because slots are
    unique and gather_idx inverts them, d_out is instead ONE row gather:
    d_out[s] = dy[gather_idx[s]] * w_slot[s] (w_slot is 0 at padding slots,
    built by the packed layout scatter). XLA fuses the multiply into the
    gather — handing the scale to the FFN kernel instead (its ``dy_scale``
    input) measured 2.5 ms/step SLOWER at ViT-S/b128 (the raw gather then
    lowers as gather + a separate broadcast-select pass). ``out`` itself is
    the residual (already materialized), so the forward saves nothing extra;
    d_gate re-gathers out rows in backward — as wide (T, d) row gathers;
    deriving it from per-slot rowsums needs 1-D element gathers, which cost
    ~10x wide row access on TPU (profiled).
    """
    y = None
    for kk in range(pair_slot.shape[1]):
        yk = jnp.take(out, pair_slot[:, kk], axis=0)
        yk = yk * gate_w[:, kk:kk + 1].astype(yk.dtype)
        y = yk if y is None else y + yk
    return y


def _combine_slots_fwd(out, pair_slot, gate_w, gather_idx, w_slot):
    return (_combine_slots(out, pair_slot, gate_w, gather_idx, w_slot),
            (out, pair_slot, gate_w, gather_idx, w_slot))


def _combine_slots_bwd(res, dy):
    out, pair_slot, gate_w, gather_idx, w_slot = res
    dyc = dy.astype(out.dtype)
    d_gate = jnp.stack(
        [jnp.sum(jnp.take(out, pair_slot[:, kk], axis=0) * dyc, axis=-1)
         for kk in range(pair_slot.shape[1])], axis=1).astype(gate_w.dtype)
    d_out = jnp.take(dyc, gather_idx, axis=0) * w_slot[:, None].astype(
        out.dtype)
    return (d_out, _f0(pair_slot), d_gate, _f0(gather_idx),
            jnp.zeros_like(w_slot))


_combine_slots.defvjp(_combine_slots_fwd, _combine_slots_bwd)


def moe_forward_fused(x: jnp.ndarray, router_w, router_b, w1, b1, w2, b2, *,
                      top_k: int = 2,
                      capacity_factor: typ.Optional[float] = None,
                      capacity: typ.Optional[int] = None):
    """MoE with the fused Pallas expert-FFN kernel.

    Dropless by default — same semantics as ``moe_forward_ragged`` (FastMoE
    dropless, exact GELU, no dropout support — callers fall back to ragged
    when drop_rate > 0). With ``capacity_factor``/``capacity`` set it becomes
    the fast single-chip form of the capacity path: static per-expert
    regions, token-major drop priority, results identical to ``moe_forward``
    (the scatter-based buffers) — but dispatched via the counting-sort layout
    + row gathers instead of XLA scatters.
    The fc1+GELU+fc2 chain runs in one kernel per row tile, keeping the
    (rows, hidden) activation in VMEM — see ``ops/fused_ffn.py`` for the
    measured HBM-traffic argument.
    """
    from .fused_ffn import fused_expert_ffn

    T, d = x.shape
    E = w1.shape[0]
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32)) + router_b
    gate_w, expert_idx = naive_topk_gate(logits, top_k)

    if capacity is None and capacity_factor is not None:
        capacity = compute_capacity(T, E, top_k, capacity_factor)

    # Layout tile: TILE_ROWS(256)-aligned groups by default. The
    # LAYOUT_ROWS(512)-aligned layout runs the backward 7.7% faster per row
    # (dw VMEM accumulates amortize, scripts/bench_ffn_bwd_r3.py) but costs
    # E*(512-256) static padding rows that the forward and every dispatch
    # gather then pay — a DILUTING fixed cost: +4.4% of rows at b128
    # (net zero end-to-end, r3), half that at b256, etc. layout_rows_policy
    # picks per T*k; SSMV_LAYOUT_ROWS={256,512} overrides for A/Bs.
    layout_tile = (layout_rows_policy(T * top_k, E)
                   if capacity is None and not _gather_in_kernel()
                   else None)
    gather_idx, pair_slot, e_of_tile, w_slot, keep = aligned_expert_layout(
        expert_idx, E, tile=layout_tile, gate_w=gate_w,
        weight_dtype=x.dtype, capacity=capacity)
    from .fused_ffn import TILE_ROWS
    if layout_tile is not None and layout_tile != TILE_ROWS:
        # the fused FFN's e_of_tile contract is per-TILE_ROWS tiles; the
        # coarser layout guarantee travels via layout_rows below
        e_of_tile = jnp.repeat(e_of_tile, layout_tile // TILE_ROWS)
    gate_eff = (gate_w if capacity is None
                else gate_w * keep.astype(gate_w.dtype))
    if _gather_in_kernel():
        # SSMV_GATHER_IN_KERNEL=1: the dispatch gather rides the FFN
        # kernel's DMA (xs never materialized) — see fused_expert_ffn_gather
        from .fused_ffn import fused_expert_ffn_gather

        out = fused_expert_ffn_gather(
            x, gather_idx, pair_slot, None if capacity is None else keep,
            w1.astype(x.dtype), b1.astype(jnp.float32),
            w2.astype(x.dtype), b2.astype(jnp.float32), e_of_tile)
    else:
        if capacity is None:
            xs = _dispatch_gather(x, gather_idx, pair_slot)
        else:
            xs = _dispatch_gather(x, gather_idx, pair_slot, keep)
        out = fused_expert_ffn(xs, w1.astype(x.dtype),
                               b1.astype(jnp.float32), w2.astype(x.dtype),
                               b2.astype(jnp.float32), e_of_tile,
                               layout_rows=layout_tile or TILE_ROWS)
    y = _combine_slots(out, pair_slot, gate_eff, gather_idx, w_slot)
    aux = {
        "balance_loss": load_balance_loss(logits, expert_idx, E),
        "drop_fraction": (jnp.asarray(0.0, jnp.float32) if capacity is None
                          else 1.0 - jnp.mean(keep.astype(jnp.float32))),
    }
    return y.astype(x.dtype), aux


def moe_forward_fused_ep(x: jnp.ndarray, router_w, router_b, w1, b1, w2,
                         b2, *, top_k: int = 2,
                         capacity_factor: float = 2.0,
                         capacity: typ.Optional[int] = None):
    """Expert-parallel ``capacity_fused``: the fused Pallas FFN under
    ``shard_map`` over the (data, expert) mesh.

    GSPMD cannot partition a ``pallas_call``, so the GSPMD EP path
    (``moe_forward``) uses XLA scatter buffers. This variant keeps the fused
    kernel: inside shard_map each expert shard

    1. computes the routing + counting-sort capacity layout for its LOCAL
       data shard's tokens (replicated work, no communication),
    2. slices the STATIC row region of its own experts (capacity regions are
       tile-aligned constants), gathers only those rows,
    3. runs the fused Pallas FFN on its local experts,
    4. combines its partial (T_local, d) output and ``psum``s over the
       expert axis (every token's k expert rows live on <= k shards).

    Semantics: token-major capacity priority PER DATA SHARD — FastMoE's
    per-rank processing order (``fmoe`` routes each rank's local batch; the
    reference instantiates world_size=1, ``resMoE.py:27-29``). With one data
    shard this is bit-identical to single-chip ``moe_forward_fused``; the
    single-device-parity and 2x4-mesh tests pin both
    (tests/test_parallel.py).

    The expert-axis collective is a psum of the (T_local, d) partials rather
    than an all_to_all of dispatched rows: with top-k=2 at most 2 shards
    contribute nonzero rows per token, so a2a moves ~k/ep of the psum bytes —
    but psum rides XLA's bandwidth-optimal ICI ring with zero layout
    machinery, and the dispatch stays the measured-fast counting-sort +
    row-gather path. Revisit if ICI ever profiles as the bottleneck.
    """
    from ..parallel.sharding import DATA_AXIS, EXPERT_AXIS, mesh_axis_size
    from .fused_ffn import TILE_ROWS, fused_expert_ffn

    E = w1.shape[0]
    ep = mesh_axis_size(EXPERT_AXIS)
    assert E % ep == 0, (E, ep)

    def local_fn(x, router_w, router_b, w1, b1, w2, b2):
        T, d = x.shape                      # this data shard's tokens
        E_local = w1.shape[0]               # this expert shard's experts
        logits = jnp.dot(x.astype(jnp.float32),
                         router_w.astype(jnp.float32)) + router_b
        gate_w, expert_idx = naive_topk_gate(logits, top_k)
        cap = capacity
        if cap is None:
            cap = compute_capacity(T, E, top_k, capacity_factor)
        gather_idx, pair_slot, _, w_slot, keep = aligned_expert_layout(
            expert_idx, E, gate_w=gate_w, weight_dtype=x.dtype, capacity=cap)
        Cp = capacity_region_rows(cap, TILE_ROWS)
        rows = E_local * Cp                 # my experts' static region
        eidx = jax.lax.axis_index(EXPERT_AXIS)
        start = eidx * rows
        g_mine = jax.lax.dynamic_slice_in_dim(gather_idx, start, rows)
        w_mine = jax.lax.dynamic_slice_in_dim(w_slot, start, rows)
        slot_local = pair_slot - start
        valid = (slot_local >= 0) & (slot_local < rows) & keep
        # invalid pairs -> the region's last row, padding by construction
        # (Cp >= capacity+1, so each expert region ends in a padding row with
        # w_slot == 0): zero forward weight, zero d_out cotangent, and the
        # valid mask zeroes the d_gate chain
        slot_l = jnp.where(valid, slot_local, rows - 1)
        xs_mine = _dispatch_gather(x, g_mine, slot_l, valid)
        e_of_tile = jnp.asarray(np.repeat(
            np.arange(E_local, dtype=np.int32), Cp // TILE_ROWS))
        out_mine = fused_expert_ffn(
            xs_mine, w1.astype(x.dtype), b1.astype(jnp.float32),
            w2.astype(x.dtype), b2.astype(jnp.float32), e_of_tile)
        gate_eff = gate_w * valid.astype(gate_w.dtype)
        y_part = _combine_slots(out_mine, slot_l, gate_eff, g_mine, w_mine)
        y = jax.lax.psum(y_part, EXPERT_AXIS)
        balance = jax.lax.pmean(load_balance_loss(logits, expert_idx, E),
                                DATA_AXIS)
        dropf = jax.lax.pmean(1.0 - jnp.mean(keep.astype(jnp.float32)),
                              DATA_AXIS)
        return y, balance, dropf

    P = jax.sharding.PartitionSpec
    y, balance, dropf = jax.shard_map(
        local_fn,
        in_specs=(P(DATA_AXIS, None), P(), P(), P(EXPERT_AXIS, None, None),
                  P(EXPERT_AXIS, None), P(EXPERT_AXIS, None, None),
                  P(EXPERT_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(), P()),
        # the vma checker can't see through pallas_call out_shapes; the
        # variance reasoning: y_part varies over (data, expert) -> psum over
        # expert leaves P(data); aux scalars are pmean'd over data and are
        # expert-invariant (computed from expert-replicated x + router)
        check_vma=False,
    )(x, router_w, router_b, w1, b1, w2, b2)
    return y.astype(x.dtype), {"balance_loss": balance,
                               "drop_fraction": dropf}


def moe_forward_fused_ep_a2a(x: jnp.ndarray, router_w, router_b, w1, b1,
                             w2, b2, *, top_k: int = 2,
                             capacity_factor: float = 2.0,
                             capacity: typ.Optional[int] = None):
    """Expert-parallel ``capacity_fused`` with an all_to_all row exchange —
    FastMoE's global exchange (``fmoe/layers.py`` scatter/gather over ranks;
    SURVEY §2.9) expressed the TPU way.

    The psum form (``moe_forward_fused_ep``) replicates routing + dispatch
    across the expert axis and reduces full (T, d) partials: ~2·(ep-1)/ep·T·d
    bytes over ICI. Here each expert shard instead owns a 1/ep TOKEN CHUNK of
    its data shard's batch end-to-end:

    1. routes its own chunk and builds the chunk's static capacity layout
       (counting-sort, dest-expert-major — so the per-destination-shard row
       blocks are already contiguous),
    2. ``all_to_all`` sends each destination shard its experts' static
       capacity regions (k·cf·T·(ep-1)/ep² rows — the "a2a of dispatched
       rows"),
    3. runs the fused Pallas FFN on rows from ALL source chunks bound for
       its local experts,
    4. ``all_to_all`` returns outputs to their source chunk, which combines
       its own tokens, and an ``all_gather`` reassembles the full (T, d)
       batch (expert-replicated, as the dense layers downstream expect).

    ICI bytes (per shard, k=2 cf=1): a2a 2·k·cf·T·(ep-1)/ep²·d + gather
    (ep-1)/ep·T·d ≈ the psum form at ep=4 and strictly less from ep=8 up; it
    also splits routing/dispatch compute ep ways instead of replicating it.

    Semantics: capacity priority is per (data shard, token chunk) — a finer
    drop granularity than the psum form's per-data-shard priority (both are
    faithful FastMoE per-rank orderings, just at different rank counts: this
    one behaves exactly like dp·ep FastMoE ranks). With capacity high enough
    that nothing drops, outputs are identical to the psum form and the
    single-chip path (tests/test_ep_capacity_fused.py).
    """
    from ..parallel.sharding import DATA_AXIS, EXPERT_AXIS, mesh_axis_size
    from .fused_ffn import TILE_ROWS, fused_expert_ffn

    E = w1.shape[0]
    ep = mesh_axis_size(EXPERT_AXIS)
    assert E % ep == 0, (E, ep)
    E_local = E // ep

    def local_fn(x, router_w, router_b, w1, b1, w2, b2):
        T, d = x.shape                      # this data shard's tokens
        if T % ep != 0:
            raise ValueError(
                f"a2a EP needs the per-data-shard token count ({T}) "
                f"divisible by the expert axis ({ep}); pad the batch or use "
                "dispatch_mode='capacity_fused' (psum form)")
        Tc = T // ep
        j = jax.lax.axis_index(EXPERT_AXIS)
        xc = jax.lax.dynamic_slice_in_dim(x, j * Tc, Tc)  # my token chunk
        logits = jnp.dot(xc.astype(jnp.float32),
                         router_w.astype(jnp.float32)) + router_b
        gate_w, expert_idx = naive_topk_gate(logits, top_k)
        cap = capacity
        if cap is None:
            cap = compute_capacity(Tc, E, top_k, capacity_factor)
        gather_idx, pair_slot, _, w_slot, keep = aligned_expert_layout(
            expert_idx, E, gate_w=gate_w, weight_dtype=x.dtype, capacity=cap)
        Cp = capacity_region_rows(cap, TILE_ROWS)
        # (E*Cp, d), ordered by global expert id -> the rows bound for shard
        # e are the contiguous block [e*E_local*Cp, (e+1)*E_local*Cp)
        xs = _dispatch_gather(xc, gather_idx, pair_slot, keep)
        xr = jax.lax.all_to_all(xs, EXPERT_AXIS, split_axis=0,
                                concat_axis=0, tiled=True)
        # xr arrives SOURCE-chunk-major: (ep src blocks) x (E_local experts
        # x Cp rows). The fused FFN backward accumulates each expert's dw
        # over a CONSECUTIVE grid-step run and flushes once
        # (fused_ffn.py::_bwd), so the grid must iterate expert-major —
        # hence the expert-major relayout (two transposes + their backward
        # mirrors). A scalar-prefetch row-permutation in the kernel's index
        # maps (fused_expert_ffn_permuted) removes the relayout copies and
        # is numerically exact, but MEASURED 123x SLOWER on real Mosaic
        # (554.9 vs 4.5 ms/iter fwd+bwd at 49k rows, v5e r5,
        # scripts/check_perm_ffn_tpu.py) — the data-dependent block index
        # maps defeat the pipeline's DMA prefetch, serializing every tile.
        # Kept as SSMV_A2A_PERMUTED=1 with parity tests; do not enable for
        # perf without new toolchain evidence (VERDICT r4 #8: settled).
        n_per = Cp // TILE_ROWS  # tiles per (src, expert) region
        e_of_step = jnp.asarray(np.repeat(
            np.arange(E_local, dtype=np.int32), ep * n_per))
        if os.environ.get("SSMV_A2A_PERMUTED", "0") != "1":
            xr = xr.reshape(ep, E_local, Cp, d).transpose(1, 0, 2, 3)
            xr = xr.reshape(ep * E_local * Cp, d)
            out = fused_expert_ffn(
                xr, w1.astype(x.dtype), b1.astype(jnp.float32),
                w2.astype(x.dtype), b2.astype(jnp.float32), e_of_step)
            # back to source-major for the return exchange
            out = out.reshape(E_local, ep, Cp, d).transpose(1, 0, 2, 3)
            out = out.reshape(ep * E_local * Cp, d)
        else:  # SSMV_A2A_PERMUTED=1 — measured-slower experiment, see above
            from .fused_ffn import fused_expert_ffn_permuted

            # grid step (e, src, t) -> source-major tile src*E_local*n_per
            # + e*n_per + t; output tiles are written back in place, so
            # ``out`` is already source-major for the return exchange
            perm = jnp.asarray(
                np.arange(ep * E_local * n_per, dtype=np.int32)
                .reshape(ep, E_local, n_per).transpose(1, 0, 2).reshape(-1))
            out = fused_expert_ffn_permuted(
                xr, w1.astype(x.dtype), b1.astype(jnp.float32),
                w2.astype(x.dtype), b2.astype(jnp.float32), e_of_step, perm)
        out_back = jax.lax.all_to_all(out, EXPERT_AXIS, split_axis=0,
                                      concat_axis=0, tiled=True)
        # out_back is back in my chunk's dest-major layout: combine my tokens
        gate_eff = gate_w * keep.astype(gate_w.dtype)
        yc = _combine_slots(out_back, pair_slot, gate_eff, gather_idx, w_slot)
        y = jax.lax.all_gather(yc, EXPERT_AXIS, axis=0, tiled=True)
        balance = jax.lax.pmean(jax.lax.pmean(
            load_balance_loss(logits, expert_idx, E), EXPERT_AXIS), DATA_AXIS)
        dropf = jax.lax.pmean(jax.lax.pmean(
            1.0 - jnp.mean(keep.astype(jnp.float32)), EXPERT_AXIS), DATA_AXIS)
        return y, balance, dropf

    P = jax.sharding.PartitionSpec
    y, balance, dropf = jax.shard_map(
        local_fn,
        in_specs=(P(DATA_AXIS, None), P(), P(), P(EXPERT_AXIS, None, None),
                  P(EXPERT_AXIS, None), P(EXPERT_AXIS, None, None),
                  P(EXPERT_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(), P()),
        # same vma reasoning as moe_forward_fused_ep: the checker can't see
        # through pallas_call; y is all_gathered over expert -> P(data), aux
        # scalars are pmean'd over both axes
        check_vma=False,
    )(x, router_w, router_b, w1, b1, w2, b2)
    return y.astype(x.dtype), {"balance_loss": balance,
                               "drop_fraction": dropf}


def moe_forward_expert_choice(x: jnp.ndarray, router_w, router_b, w1, b1,
                              w2, b2, *, capacity_factor: float = 2.0,
                              capacity: typ.Optional[int] = None,
                              activation: typ.Callable = partial(
                                  jax.nn.gelu, approximate=False),
                              dropout_rng=None, drop_rate: float = 0.0,
                              shard_buf: typ.Callable = lambda b: b):
    """Expert-choice routing (Zhou et al. 2022): each EXPERT picks its top-C
    tokens instead of each token picking experts.

    Not a FastMoE-parity mode — an additional capability. TPU-friendly by
    construction: no sorts, one row gather of regular (E, C) shape, grouped
    GEMM over (E, C, d), weighted scatter-add back. Perfect load balance by
    definition (no aux loss needed); tokens may be served by 0..E experts.

    capacity C defaults to ceil(T * capacity_factor / E).
    """
    T, d = x.shape
    E = w1.shape[0]
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32)) + router_b
    # affinity softmax over experts per token, then experts choose tokens
    probs = jax.nn.softmax(logits, axis=-1)  # (T, E)
    if capacity is None:
        capacity = int(T * capacity_factor / E) + 1
        capacity = min(((capacity + 7) // 8) * 8, T)
    gate_w, token_idx = jax.lax.top_k(probs.T, capacity)  # (E, C) each
    xs = jnp.take(x, token_idx.reshape(-1), axis=0)       # (E*C, d)
    # (E, C, d) buffer is static-shaped -> expert-parallel capable: the
    # sharding constraint makes XLA all_to_all it to expert-sharded devices
    buf = shard_buf(xs.reshape(E, capacity, d))
    out = grouped_ffn(buf, w1, b1, w2, b2, activation=activation,
                      dropout_rng=dropout_rng, drop_rate=drop_rate)
    out = shard_buf(out)
    # combine: y[t] += gate * out[e, c] for each chosen (e, c)
    flat = out.reshape(E * capacity, d) * gate_w.reshape(-1, 1).astype(out.dtype)
    y = jnp.zeros((T, d), flat.dtype).at[token_idx.reshape(-1)].add(flat)
    served = jnp.zeros((T,), jnp.float32).at[token_idx.reshape(-1)].add(1.0)
    aux = {
        "balance_loss": jnp.asarray(0.0, jnp.float32),  # balanced by design
        "drop_fraction": jnp.mean((served == 0).astype(jnp.float32)),
    }
    return y.astype(x.dtype), aux


def moe_dense(x: jnp.ndarray, router_w, router_b, w1, b1, w2, b2, *,
              top_k: int = 2,
              activation: typ.Callable = partial(jax.nn.gelu, approximate=False)):
    """Exact dropless MoE: run every expert on every token, mix by gates.

    O(E) more FLOPs than dispatch; golden reference for tests (equals FastMoE's
    dropless semantics exactly, and equals ``moe_forward`` when nothing drops).
    """
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32)) + router_b
    gate_w, expert_idx = naive_topk_gate(logits, top_k)
    h = jnp.einsum("td,edh->eth", x.astype(jnp.float32), w1.astype(jnp.float32))
    h = activation(h + b1[:, None, :])
    out = jnp.einsum("eth,ehd->etd", h, w2.astype(jnp.float32)) + b2[:, None, :]
    # (E, T, d) → pick each token's k experts
    picked = jnp.take_along_axis(
        out.transpose(1, 0, 2), expert_idx[:, :, None], axis=1
    )  # (T, k, d)
    y = jnp.einsum("tkd,tk->td", picked, gate_w.astype(picked.dtype))
    return y.astype(x.dtype)
