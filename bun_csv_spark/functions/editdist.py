"""Batched bit-parallel Levenshtein (Myers 1999, Hyyrö multi-word block
extension) — the r19 per-task kernel for exact edit-distance verification.

Why not the built-in ``F.levenshtein``: the JVM expression computes the
full O(m·n) DP matrix per pair — at the neardup_editdist gate's sf0.1
workload (156k LSH candidate pairs × ~304² chars ≈ 1.4e10 DP cells) that
is ~6.7 s across 32 cores, and it was already the registry's biggest
single-gate residual after the r18 parallelism fixes. Myers' algorithm
processes 64 DP columns per machine word (O(n·⌈m/64⌉) word-ops), and this
implementation additionally vectorizes ACROSS the pairs of an Arrow batch
with numpy uint64 lanes, so the per-task cost is ~n word-ops per pair
lane-parallel — measured 2.84 s for 10k corpus-shaped pairs single-core
(~44 s/156k) vs the DP's ~215 s single-core equivalent, a ~5x kernel win
that survives the Python boundary because only (text_a, text_b, lev)
cross it (guide §4.2 "hand whole batches to vectorized native code").

EXACTNESS: Myers computes the true unrestricted Levenshtein distance (no
band, no threshold cutoff) — it is the same number the DP produces, and
the DuckDB gate oracle plus the randomized law test
(tests/test_round19_ops.py::test_myers_matches_builtin_levenshtein, which
compares against ``F.levenshtein`` itself over unicode/empty/64-boundary
cases) pin the equality. Distances are computed on Unicode CODE POINTS
(utf-32 decode), matching UTF8String.levenshteinDistance.

Batching design (all O(batch) driver/executor state, nothing quadratic):
pairs are sorted by |b| descending so step j operates on a contiguous
shrinking "active" prefix (no masking); state is word-major (W, P) so
every numpy op runs on contiguous lanes; the per-batch alphabet is
``np.unique`` + ``searchsorted`` (the ``return_inverse`` path argsorts
the whole concatenation and measured 4x the entire kernel)."""

# NOTE: no `from __future__ import annotations` here — pandas_udf infers
# the eval type from the RUNTIME annotations of the wrapped function, and
# PEP-563 stringized hints ('pd.Series') are not resolved by that path.
import numpy as np
import pandas as pd

_ONES = np.uint64(0xFFFFFFFFFFFFFFFF)
_ONE = np.uint64(1)
_S63 = np.uint64(63)


def batched_levenshtein(as_, bs):
    """Exact Levenshtein distance per (as_[i], bs[i]) pair as int64."""
    n_pairs = len(as_)
    out = np.zeros(n_pairs, dtype=np.int64)
    a_codes = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in as_]
    b_codes = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in bs]
    m_all = np.fromiter((len(x) for x in a_codes), np.int64, n_pairs)
    n_all = np.fromiter((len(x) for x in b_codes), np.int64, n_pairs)
    out[m_all == 0] = n_all[m_all == 0]
    out[(n_all == 0) & (m_all > 0)] = m_all[(n_all == 0) & (m_all > 0)]
    live = np.where((m_all > 0) & (n_all > 0))[0]
    if live.size == 0:
        return out
    # sort by |b| desc -> the active prefix shrinks monotonically and
    # step j never touches finished pairs
    order = live[np.argsort(-n_all[live], kind="stable")]
    a_codes = [a_codes[i] for i in order]
    b_codes = [b_codes[i] for i in order]
    m = m_all[order]
    n = n_all[order]
    P = order.size
    W = int((m.max() + 63) // 64)
    maxn = int(n[0])
    alpha = np.unique(np.concatenate(a_codes + b_codes))
    A = alpha.size
    # Peq[w][p, c]: bitmask of positions of alphabet char c in a_p, word w
    Peq = np.zeros((W, P, A), dtype=np.uint64)
    pair_rep = np.repeat(np.arange(P), m)
    codes_flat = np.searchsorted(alpha, np.concatenate(a_codes))
    pos_flat = np.concatenate([np.arange(k) for k in m])
    np.bitwise_or.at(
        Peq,
        (pos_flat >> 6, pair_rep, codes_flat),
        _ONE << (pos_flat & 63).astype(np.uint64),
    )
    Bm = np.zeros((P, maxn), dtype=np.int64)
    for i, bi in enumerate(b_codes):
        Bm[i, : len(bi)] = np.searchsorted(alpha, bi)
    neg_n = -n
    Pv = np.zeros((W, P), dtype=np.uint64)
    full, rem = np.divmod(m, 64)
    ones_w = np.full(P, _ONES, dtype=np.uint64)
    zeros_w = np.zeros(P, dtype=np.uint64)
    part = (_ONE << rem.astype(np.uint64)) - _ONE
    for w in range(W):
        Pv[w] = np.where(w < full, ones_w, np.where(w == full, part, zeros_w))
    Mv = np.zeros((W, P), dtype=np.uint64)
    score = m.copy()
    lw = ((m - 1) >> 6).astype(np.int64)
    lbit = _ONE << ((m - 1) & 63).astype(np.uint64)
    rows = np.arange(P)
    for j in range(maxn):
        # actives are pairs with n > j (strict: side='left' on -n)
        k = int(np.searchsorted(neg_n, -j, side="left"))
        if k == 0:
            break
        bj = Bm[:k, j]
        r = rows[:k]
        carry = zeros_w[:k]
        Xh_w = []
        Xv_w = []
        for w in range(W):
            Eq = Peq[w][r, bj]
            Pvw = Pv[w][:k]
            Xv_w.append(Eq | Mv[w][:k])
            # (Eq & Pv) + Pv with inter-word carry (unsigned overflow test)
            T = Eq & Pvw
            s1 = T + Pvw
            c1 = s1 < T
            S = s1 + carry
            c2 = S < s1
            carry = (c1 | c2).astype(np.uint64)
            Xh_w.append((S ^ Pvw) | Eq)
        ph_carry = np.full(k, 1, dtype=np.uint64)
        mh_carry = zeros_w[:k]
        for w in range(W):
            Pvw = Pv[w][:k]
            Xh = Xh_w[w]
            Ph = Mv[w][:k] | ~(Xh | Pvw)
            Mh = Pvw & Xh
            sel = lw[:k] == w
            if sel.any():
                score[:k][sel] += ((Ph & lbit[:k]) != 0)[sel]
                score[:k][sel] -= ((Mh & lbit[:k]) != 0)[sel]
            Ph_s = (Ph << _ONE) | ph_carry
            Mh_s = (Mh << _ONE) | mh_carry
            ph_carry = Ph >> _S63
            mh_carry = Mh >> _S63
            Pv[w][:k] = Mh_s | ~(Xv_w[w] | Ph_s)
            Mv[w][:k] = Ph_s & Xv_w[w]
    out[order] = score
    return out


def levenshtein_udf():
    """Arrow-batched (Series, Series) -> Series pandas UDF wrapping
    ``batched_levenshtein``; NULL in either input yields NULL, matching
    ``F.levenshtein``. Built lazily (needs an active session)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _lev(a: pd.Series, b: pd.Series) -> pd.Series:
        mask = a.isna() | b.isna()
        if mask.all():
            return pd.Series([None] * len(a), dtype="Int64")
        av = a.fillna("").tolist()
        bv = b.fillna("").tolist()
        vals = batched_levenshtein(av, bv)
        res = pd.Series(vals, dtype="Int64", index=a.index)
        res[mask] = None
        return res

    return _lev
