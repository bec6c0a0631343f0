#!/usr/bin/env python3
"""Differential check: replay graft.RefDump's training runs through the
reference implementation (pure NumPy) and compare weights + metrics.

Usage: python3 tools/ref_diff.py [/tmp/ref_dump.jsonl] [sfDir]
"""
import sys, json
import numpy as np

sys.path.insert(0, "/root/reference")
from xpysom_dask import XPySom  # noqa: E402

def main(dump_path="/tmp/ref_dump.jsonl", sf_dir="/root/testdata/sf0.001"):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    order = np.argsort(np.array(t.column("vec_id")))
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    init = emb[:9].reshape(3, 3, -1).copy()
    dim = emb.shape[1]

    n_pass = n_fail = 0
    for line in open(dump_path):
        rec = json.loads(line)
        kwargs = {}
        if rec["distance"] == "norm_p":
            # the reference's even-p branch does range(p+1): integral p
            # must be passed as int or it raises
            p = rec["normP"]
            kwargs = {"p": int(p) if float(p).is_integer() else p}
        som = XPySom(3, 3, dim,
                     sigma=rec["sigma"], sigmaN=rec["sigmaN"],
                     learning_rate=0.5, learning_rateN=0.01,
                     decay_function=rec["decay"],
                     neighborhood_function=rec["neighborhood"],
                     std_coeff=rec["stdCoeff"],
                     topology=rec["topology"],
                     activation_distance=rec["distance"],
                     activation_distance_kwargs=kwargs,
                     compact_support=rec["compact"],
                     random_seed=1)
        som._weights = init.copy()
        som.train(emb, rec["epochs"])
        ref_w = np.asarray(som._weights, dtype=np.float64).reshape(-1)
        got_w = np.array(rec["weights"])
        w_err = np.max(np.abs(ref_w - got_w) / (np.abs(ref_w) + 1e-6))
        ref_qe = som.quantization_error(emb)
        ref_te = som.topographic_error(emb)
        ref_dm = som.distance_map().reshape(-1)
        got_dm = np.array(rec["dm"])
        dm_err = np.max(np.abs(ref_dm - got_dm))
        qe_err = abs(ref_qe - rec["qe"])
        te_err = abs(ref_te - rec["te"])
        # winner parity: per-sample BMU flat ids from the trained model
        ref_winners = som.winner(emb)
        ref_bmus = [i * 3 + j for (i, j) in ref_winners]
        got_bmus = rec.get("bmus", [])
        bmu_mism = sum(1 for a, b in zip(ref_bmus, got_bmus) if a != b)
        # even norm_p: the reference expands (x-w)^p binomially in float32
        # (distances.py:77-96), cancelling ~2 digits vs the fused float64
        # |x-w|^p loop here — weights agree to ~5e-3 relative while BMUs,
        # QE, TE and the U-matrix stay exact, so widen only w_err
        w_tol = 1e-2 if (rec["distance"] == "norm_p"
                         and float(rec["normP"]).is_integer()
                         and int(rec["normP"]) % 2 == 0) else 1e-3
        ok = (w_err < w_tol and qe_err < 1e-3 and te_err < 1e-9
              and dm_err < 1e-3 and bmu_mism == 0)
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {rec['name']}: w_rel_err={w_err:.2e} qe_err={qe_err:.2e} "
              f"te_err={te_err:.2e} dm_err={dm_err:.2e} bmu_mismatch={bmu_mism}/{len(got_bmus)}")
        if ok: n_pass += 1
        else: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
