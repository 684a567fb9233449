"""Prototype: flat-batch _doc_features (one concatenated numpy pass per
Arrow batch) vs the per-doc loop in hsip/textkernel.py.

The span hash (pref[e]-pref[s])*inv[s] is position-independent, so
hashes computed over one concatenated byte array equal the per-doc
values bit-for-bit as long as spans never cross doc boundaries.

Usage: python bench/flat_features_proto.py [n_docs] [avg_len]
Prints: equality verdict over randomized corpora (incl. edge cases),
then timings old vs new.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from hsip.textkernel import _B, _BINV, _doc_features, _mix, _span_hashes  # noqa: E402


def _flat_doc_features(datas: list[np.ndarray], k: int, seed: np.uint64):
    """Flat-batch equivalent of [_doc_features(d, k, seed) for d in datas].

    Returns (shingle_flat, shingle_lens, token_flat, token_lens) where
    per-doc slices are bit-identical (same values, same order) to the
    per-doc kernel's outputs.
    """
    n_docs = len(datas)
    doc_lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=n_docs)
    doc_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(doc_lens, out=doc_starts[1:])
    N = int(doc_starts[-1])
    data = (
        np.concatenate([d for d in datas if len(d)])
        if N
        else np.empty(0, dtype=np.uint8)
    )

    # global prefix machinery (position-independent: per-span values
    # match the per-doc kernel exactly)
    pref = np.zeros(N + 1, dtype=np.uint64)
    pw = np.empty(max(N, 1), dtype=np.uint64)
    pw[0] = 1
    if N > 1:
        np.cumprod(np.full(N - 1, _B, dtype=np.uint64), out=pw[1:])
    if N:
        np.cumsum(data.astype(np.uint64) * pw[:N], out=pref[1:])
    inv = np.empty(N + 1, dtype=np.uint64)
    inv[0] = 1
    if N:
        np.cumprod(np.full(N, _BINV, dtype=np.uint64), out=inv[1:])

    # token spans: break at spaces AND at doc boundaries
    spaces = np.nonzero(data == 32)[0] if N else np.empty(0, dtype=np.int64)
    # candidate token starts: each doc start, and each space+1
    cand_starts = np.concatenate([doc_starts[:-1], spaces + 1])
    cand_ends = np.concatenate([doc_starts[1:], spaces])
    order_s = np.argsort(cand_starts, kind="stable")
    order_e = np.argsort(cand_ends, kind="stable")
    tok_starts = cand_starts[order_s]
    tok_ends = cand_ends[order_e]
    # NOTE: starts and ends pair up positionally exactly as in the
    # per-doc kernel: within a doc the starts are [ds, sp+1...] and the
    # ends are [sp..., de]; sorting both lists globally preserves the
    # per-doc pairing because docs are contiguous. Zero-length docs
    # contribute start ds and end ds (= de), forming an empty token
    # dropped by the keep mask below -- matching the per-doc n==0 branch
    # only if we special-case it (done below).
    keep = tok_ends > tok_starts
    tok_starts, tok_ends = tok_starts[keep], tok_ends[keep]

    # per-doc token counts
    tok_doc = np.searchsorted(doc_starts[1:], tok_starts, side="right")
    tcnt = np.bincount(tok_doc, minlength=n_docs)
    tok_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(tcnt, out=tok_off[1:])

    token_hashes = (
        _span_hashes(data, tok_starts, tok_ends, pref, inv, seed)
        if len(tok_starts)
        else np.empty(0, dtype=np.uint64)
    )

    # gram spans: within each doc, starts tok[i], ends tok[i+k-1], for
    # i in [0, nt-k]. Build global token-index lists.
    nt_of_tok = tcnt[tok_doc] if len(tok_doc) else np.empty(0, dtype=np.int64)
    within = (
        np.arange(len(tok_starts), dtype=np.int64) - tok_off[tok_doc]
        if len(tok_starts)
        else np.empty(0, dtype=np.int64)
    )
    gmask = (within <= nt_of_tok - k) & (nt_of_tok >= k)
    gidx = np.nonzero(gmask)[0]
    gram_hashes = (
        _span_hashes(data, tok_starts[gidx], tok_ends[gidx + (k - 1)], pref, inv, seed)
        if len(gidx)
        else np.empty(0, dtype=np.uint64)
    )
    gram_doc = tok_doc[gidx] if len(gidx) else np.empty(0, dtype=np.int64)

    # per-doc sorted-unique gram hashes, one global lexsort
    if len(gram_hashes):
        order = np.lexsort((gram_hashes, gram_doc))
        gh = gram_hashes[order]
        gd = gram_doc[order]
        first = np.empty(len(gh), dtype=bool)
        first[0] = True
        np.not_equal(gh[1:], gh[:-1], out=first[1:])
        first[1:] |= gd[1:] != gd[:-1]
        gh_u = gh[first]
        gd_u = gd[first]
        sh_cnt = np.bincount(gd_u, minlength=n_docs)
    else:
        gh_u = np.empty(0, dtype=np.uint64)
        gd_u = np.empty(0, dtype=np.int64)
        sh_cnt = np.zeros(n_docs, dtype=np.int64)

    # fallback docs: nt < k (including nt == 0 and n == 0) get a single
    # whole-doc hash
    fb = tcnt < k
    fb_idx = np.nonzero(fb)[0]
    if len(fb_idx):
        fb_n = doc_lens[fb_idx]
        # n == 0 -> _mix(0, seed); else whole-span hash over [ds, de)
        fb_hash = np.where(
            fb_n == 0,
            _mix(np.zeros(len(fb_idx), dtype=np.uint64), seed),
            _span_hashes(
                data, doc_starts[:-1][fb_idx], doc_starts[1:][fb_idx], pref, inv, seed
            ),
        )
        sh_cnt = sh_cnt.copy()
        sh_cnt[fb_idx] = 1
        # merge fallback singletons into the unique-gram stream in doc order
        out_off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(sh_cnt, out=out_off[1:])
        total_sh = int(out_off[-1])
        sh_flat = np.empty(total_sh, dtype=np.uint64)
        # place gram uniques
        if len(gh_u):
            # target positions: for doc d (non-fallback), occupy
            # out_off[d] .. out_off[d]+cnt
            gpos = np.empty(len(gh_u), dtype=np.int64)
            # index within doc = running position: since gd_u sorted by doc,
            # within-doc rank = arange - first-occurrence offset of that doc
            doc_first = np.zeros(n_docs, dtype=np.int64)
            cnt_g = np.bincount(gd_u, minlength=n_docs)
            np.cumsum(cnt_g[:-1], out=doc_first[1:])
            gpos = np.arange(len(gh_u), dtype=np.int64) - doc_first[gd_u] + out_off[gd_u]
            sh_flat[gpos] = gh_u
        sh_flat[out_off[:-1][fb_idx]] = fb_hash
    else:
        out_off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(sh_cnt, out=out_off[1:])
        sh_flat = gh_u

    return sh_flat, np.diff(out_off), token_hashes, tcnt, tok_off


def _rand_texts(rng, n_docs, avg_len):
    words = ["alpha", "beta", "gamma", "delta", "x", "longword" * 3, "tok"]
    texts = []
    for _ in range(n_docs):
        L = max(0, int(rng.gauss(avg_len, avg_len / 2)))
        nw = max(0, L // 6)
        texts.append(" ".join(rng.choice(words) for _ in range(nw)))
    # edge cases
    texts[0] = ""
    if n_docs > 3:
        texts[1] = "single"
        texts[2] = "two tok"
    return texts


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    avg_len = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    k = 5
    seed = np.uint64(42)
    import random

    rng = random.Random(7)
    texts = _rand_texts(rng, n_docs, avg_len)
    datas = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts]

    # correctness: bit-identical per doc
    t0 = time.perf_counter()
    olds = [_doc_features(d, k, seed) for d in datas]
    t_old = time.perf_counter() - t0

    t0 = time.perf_counter()
    sh_flat, sh_lens, tok_flat, tok_lens, tok_off = _flat_doc_features(datas, k, seed)
    t_new = time.perf_counter() - t0

    sh_off = np.zeros(len(datas) + 1, dtype=np.int64)
    np.cumsum(sh_lens, out=sh_off[1:])
    bad = 0
    for i, (sh_o, th_o) in enumerate(olds):
        sh_n = sh_flat[sh_off[i] : sh_off[i + 1]]
        th_n = tok_flat[tok_off[i] : tok_off[i + 1]]
        if not (np.array_equal(sh_o, sh_n) and np.array_equal(th_o, th_n)):
            bad += 1
            if bad <= 3:
                print(f"MISMATCH doc {i}: text={texts[i][:60]!r}")
                print(f"  old sh={sh_o[:5]} new sh={sh_n[:5]}")
                print(f"  old th={th_o[:5]} new th={th_n[:5]}")
    print(f"docs={n_docs} mismatches={bad}")
    print(f"old(per-doc)={t_old:.3f}s new(flat)={t_new:.3f}s speedup={t_old/max(t_new,1e-9):.2f}x")


if __name__ == "__main__":
    main()
