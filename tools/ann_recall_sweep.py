"""ANN recall sweep: LSH (planes × probe radius) and IVF (codebook type).

Numpy mirror of operators/similarity.py's exact plane components, probe
masks, strided/kmeans codebooks, and tie rules — sweeps knob settings far
faster than launching Spark per config. The Spark operators equal this
math by construction (oracle + equivalence tests pin that); this script
only informs the DEFAULT knob choice recorded in SCALING.md.

Usage: python tools/ann_recall_sweep.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, ".")
from pm25ml_spark.operators.similarity import plane_component, probe_masks  # noqa: E402


def load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, V


def true_top1(ids, V, qmask):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Q = Vn[qmask]
    S = Q @ Vn.T
    S[np.arange(len(Q)), np.nonzero(qmask)[0]] = -np.inf
    # operator tie rule: rounded score DESC, cid ASC — replicate
    R = np.round(S, 6)
    best = np.lexsort((ids[None, :].repeat(len(Q), 0), -R), axis=1)[:, 0]
    return ids[best]


def lsh_recall(ids, V, qmask, truth, n_planes, h):
    P = np.array(
        [[plane_component(p, i) for i in range(V.shape[1])] for p in range(n_planes)],
        dtype=np.float64,
    )
    bits = (V @ P.T) >= 0
    sig = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
    masks = np.array(probe_masks(n_planes, h), dtype=np.int64)
    qsig = sig[qmask]
    probed = qsig[:, None] ^ masks[None, :]  # (nq, n_probes)
    # candidate fraction + recall: is the true NN's bucket probed?
    id_to_idx = {int(i): j for j, i in enumerate(ids)}
    t_idx = np.array([id_to_idx[int(t)] for t in truth])
    hit = (sig[t_idx][:, None] == probed).any(axis=1)
    # mean candidate fraction = sum over probes of bucket occupancy / n
    occ = np.bincount(sig % (1 << n_planes), minlength=1 << n_planes)
    cand = occ[probed % (1 << n_planes)].sum(axis=1).mean() / len(ids)
    return hit.mean(), cand


def multi_table_recall(ids, V, qmask, truth, n_planes, h, n_tables):
    """Union-of-L-tables recall (mirrors lsh_bucket_topk(n_tables=L):
    table t draws plane indices t*n_planes..). cand_frac is an upper
    bound (per-table fractions summed; tables overlap)."""
    id_to_idx = {int(i): j for j, i in enumerate(ids)}
    t_idx = np.array([id_to_idx[int(t)] for t in truth])
    hit = np.zeros(int(qmask.sum()), dtype=bool)
    cand_frac = 0.0
    masks = np.array(probe_masks(n_planes, h), dtype=np.int64)
    for t in range(n_tables):
        P = np.array(
            [
                [plane_component(t * n_planes + p, i) for i in range(V.shape[1])]
                for p in range(n_planes)
            ],
            dtype=np.float64,
        )
        sig = (((V @ P.T) >= 0) * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        probed = sig[qmask][:, None] ^ masks[None, :]
        hit |= (sig[t_idx][:, None] == probed).any(axis=1)
        occ = np.bincount(sig, minlength=1 << n_planes)
        cand_frac += occ[probed].sum(axis=1).mean() / len(ids)
    return hit.mean(), cand_frac


def kmeans_np(V, k, n_iter=5):
    """Mirror kmeans_fit: k lowest-id rows init, L2 assign, mean update."""
    C = V[:k].copy()
    for _ in range(n_iter):
        d2 = (V * V).sum(1, keepdims=True) - 2 * V @ C.T + (C * C).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        for j in range(k):
            if (a == j).any():
                C[j] = V[a == j].mean(axis=0)
    return C


def ivf_recall(ids, V, qmask, truth, CM, nprobe, k=3):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Cn = CM / np.linalg.norm(CM, axis=1, keepdims=True)
    S = np.round(Vn @ Cn.T, 6)
    # assign: score DESC, cen_id ASC (cen ids are positional here)
    assign = np.lexsort((np.arange(S.shape[1])[None, :].repeat(len(V), 0), -S), axis=1)[:, 0]
    qa = np.lexsort((np.arange(S.shape[1])[None, :].repeat(qmask.sum(), 0), -S[qmask]), axis=1)[:, :nprobe]
    id_to_idx = {int(i): j for j, i in enumerate(ids)}
    # truth here: top-k true neighbours; recall@k = |approx∩true|/k
    Q = Vn[qmask]
    St = Q @ Vn.T
    St[np.arange(len(Q)), np.nonzero(qmask)[0]] = -np.inf
    Rt = np.round(St, 6)
    order = np.lexsort((ids[None, :].repeat(len(Q), 0), -Rt), axis=1)
    hits = 0
    tot = 0
    list_sz = 0
    for qi in range(len(Q)):
        probed_cells = set(qa[qi].tolist())
        cand = np.nonzero(np.isin(assign, list(probed_cells)))[0]
        cand = cand[ids[cand] != ids[np.nonzero(qmask)[0][qi]]]
        list_sz += len(cand)
        true_k = set(ids[order[qi, :k]].tolist())
        sc = Rt[qi, cand]
        if len(cand):
            o = np.lexsort((ids[cand], -sc))
            approx_k = set(ids[cand[o[:k]]].tolist())
        else:
            approx_k = set()
        hits += len(true_k & approx_k)
        tot += k
    return hits / tot, list_sz / len(Q) / len(ids)


def planted(n=6000, d=64, n_clusters=10, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, d)) * 2
    V = cents[np.arange(n) % n_clusters] + rng.normal(size=(n, d)) * 0.8
    return np.arange(n, dtype=np.int64), V.astype(np.float64)


def pq_recall(ids, V, qmask, m, stride, offset=7):
    """PQ/ADC recall@3 of the true L2 top-1 — numpy mirror of
    operators.similarity.pq_adc_topk (same strided codebook, 6-dp
    rounding, and id tie-breaks)."""
    d = V.shape[1]
    sd = d // m
    Q = V[qmask]
    qids = ids[qmask]
    D = ((Q[:, None, :] - V[None, :, :]) ** 2).sum(-1)
    D[np.arange(len(Q)), np.nonzero(qmask)[0]] = np.inf
    true1 = ids[
        np.lexsort((ids[None, :].repeat(len(Q), 0), np.round(D, 6)), axis=1)[:, 0]
    ]
    cmask = (ids % stride) == offset
    cen, cen_ids = V[cmask], ids[cmask]
    codes = np.zeros((len(V), m), dtype=int)
    for s in range(m):
        dd = np.round(
            ((V[:, s * sd:(s + 1) * sd][:, None, :] - cen[None, :, s * sd:(s + 1) * sd]) ** 2).sum(-1),
            6,
        )
        codes[:, s] = np.lexsort((cen_ids[None, :].repeat(len(V), 0), dd), axis=1)[:, 0]
    rec3 = 0
    for qi in range(len(Q)):
        lut = np.stack(
            [
                np.round(
                    ((Q[qi, s * sd:(s + 1) * sd][None, :] - cen[:, s * sd:(s + 1) * sd]) ** 2).sum(-1),
                    6,
                )
                for s in range(m)
            ]
        )
        adist = lut[np.arange(m)[:, None], codes.T].sum(0)
        adist[ids == qids[qi]] = np.inf
        top3 = ids[np.lexsort((ids, np.round(adist, 6)))[:3]]
        rec3 += true1[qi] in top3
    return len(cen), rec3 / len(Q)


def ivfpq_recall(ids, V, qmask, coarse_stride, m, pq_stride, nprobe=4, offset=7):
    """IVFADC recall@3 of the true L2 top-1 — numpy mirror of
    operators.similarity.ivfpq_topk (L2 coarse assign, residual PQ,
    per-list query LUTs, 6-dp rounding, id tie-breaks)."""
    d = V.shape[1]
    sd = d // m
    Q = V[qmask]
    qids = ids[qmask]
    D = ((Q[:, None, :] - V[None, :, :]) ** 2).sum(-1)
    D[np.arange(len(Q)), np.nonzero(qmask)[0]] = np.inf
    true1 = ids[
        np.lexsort((ids[None, :].repeat(len(Q), 0), np.round(D, 6)), axis=1)[:, 0]
    ]
    cmask = (ids % coarse_stride) == offset
    CM, CMids = V[cmask], ids[cmask]
    o = np.argsort(CMids)
    CM, CMids = CM[o], CMids[o]
    Dc = np.round(((V[:, None, :] - CM[None, :, :]) ** 2).sum(-1), 6)
    assign = Dc.argmin(axis=1)           # CMids ascend: first min wins ties
    resid = V - CM[assign]
    pmask = (ids % pq_stride) == offset
    cen = resid[pmask]
    codes = np.zeros((len(V), m), dtype=int)
    for s in range(m):
        dd = np.round(((resid[:, s*sd:(s+1)*sd][:, None, :]
                        - cen[None, :, s*sd:(s+1)*sd]) ** 2).sum(-1), 6)
        codes[:, s] = dd.argmin(axis=1)
    rec3 = 0
    avg_cand = 0
    for qi in range(len(Q)):
        dq = np.round(((Q[qi][None, :] - CM) ** 2).sum(-1), 6)
        probe = np.argsort(dq, kind="stable")[:nprobe]
        best = {}
        for j in probe:
            members = np.nonzero(assign == j)[0]
            members = members[ids[members] != qids[qi]]
            avg_cand += len(members)
            qr = Q[qi] - CM[j]
            lut = np.stack([
                np.round(((qr[s*sd:(s+1)*sd][None, :]
                           - cen[:, s*sd:(s+1)*sd]) ** 2).sum(-1), 6)
                for s in range(m)
            ])
            ad = lut[np.arange(m)[:, None], codes[members].T].sum(0)
            for i, mi in enumerate(members):
                best[ids[mi]] = ad[i]
        top3 = sorted(best, key=lambda c: (best[c], c))[:3]
        rec3 += true1[qi] in top3
    return len(CM), len(cen), rec3 / len(Q), avg_cand / len(Q) / len(ids)


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    corpora = [(d.split("/")[-1], *load(d)) for d in dirs]
    corpora.append(("planted-10c", *planted()))
    for name, ids, V in corpora:
        qmask = ids % 50 == 0
        truth = true_top1(ids, V, qmask)
        print(f"== {name}: n={len(ids)} nq={qmask.sum()}")
        for n_planes in (6, 8, 10, 12):
            for h in (0, 1, 2):
                r, c = lsh_recall(ids, V, qmask, truth, n_planes, h)
                print(f"  LSH planes={n_planes:2d} h={h}  recall@1={r:.2f} cand_frac={c:.4f}")
        for npl, h, nt in ((8, 1, 2), (8, 2, 2), (8, 1, 4), (12, 2, 4)):
            r, c = multi_table_recall(ids, V, qmask, truth, npl, h, nt)
            print(
                f"  LSH planes={npl:2d} h={h} tables={nt}  "
                f"recall@1={r:.2f} cand_frac<={c:.4f}"
            )
        n = len(ids)
        k_strided = max(n // 100, 1)
        CM_str = V[ids % 100 == 7]
        CM_km = kmeans_np(V, k_strided)
        for tag, CM in (("strided", CM_str), ("kmeans", CM_km)):
            for nprobe in (2, 4):
                r, c = ivf_recall(ids, V, qmask, truth, CM, nprobe)
                print(f"  IVF {tag:8s} k={len(CM):3d} nprobe={nprobe}  recall@3={r:.2f} cand_frac={c:.4f}")
        for m, stride in ((8, 31), (16, 13), (32, 13)):
            K, r = pq_recall(ids, V, qmask, m, stride)
            print(f"  PQ  m={m:2d} sub_dim={V.shape[1] // m} K={K:3d}  recall@3={r:.2f}")
        for cs, m, ps, nprobe in ((100, 16, 13, 2), (100, 16, 13, 4), (100, 32, 13, 4)):
            kc, kp, r, c = ivfpq_recall(ids, V, qmask, cs, m, ps, nprobe)
            print(
                f"  IVFPQ coarse={kc:3d} m={m:2d} K={kp:3d} nprobe={nprobe}  "
                f"recall@3={r:.2f} cand_frac={c:.4f}"
            )


if __name__ == "__main__":
    main()
