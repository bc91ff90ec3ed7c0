#!/usr/bin/env python
"""A/B the Pallas sorted-merge (benchmarks/mergesorted.py) against lax.sort at
binning scale: k pre-sorted sequences of (key + R payload rows), total n
lanes — the shape of the pair-table ordering problem once the splat-level
sort makes every elementwise path's keys ascending (see mergesorted.py).

Timing: dispatch N, fetch one dependent scalar (axon block_until_ready
does not block).

    GSWT_MERGE_N=4194304 GSWT_MERGE_K=5 GSWT_MERGE_ROWS=6 \
        python benchmarks/micro_merge.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import mergesorted as ms  # noqa: E402


def main():
    n = int(os.environ.get("GSWT_MERGE_N") or (1 << 22))
    k = int(os.environ.get("GSWT_MERGE_K") or 5)
    n_rows = 1 + int(os.environ.get("GSWT_MERGE_ROWS") or 6)
    block = int(os.environ.get("GSWT_MERGE_BLOCK") or 2048)
    interp = jax.devices()[0].platform == "cpu"  # pallas needs interpret
    rng = np.random.default_rng(0)
    keys = rng.choice(np.int64(1) << 31, size=n, replace=False)
    keys = (keys - (np.int64(1) << 30)).astype(np.int32)
    parts = [np.sort(p) for p in np.array_split(rng.permutation(keys), k)]

    def table(kk):
        rows = [kk.view(np.float32)]
        for r in range(n_rows - 1):
            rows.append((kk * (0.1 * (r + 1))).astype(np.float32))
        return jnp.asarray(np.stack(rows))

    tabs = [table(p) for p in parts]
    flat_key = jnp.asarray(np.concatenate(parts))
    flat_rows = [jnp.concatenate([t[r] for t in tabs], axis=0)
                 for r in range(1, n_rows)]

    def run(f, args, n_it=20, reps=3):
        jf = jax.jit(f)
        _ = jax.device_get(jf(*args))
        best = []
        for _ in range(reps):
            t0 = time.time()
            acc = None
            for _ in range(n_it):
                acc = jf(*args)
            _ = jax.device_get(acc)
            best.append((time.time() - t0) / n_it * 1e3)
        return float(np.min(best))

    print(f"n={n} k={k} rows={n_rows - 1} block={block}")

    def f_sort(kk, *rows):
        srt = jax.lax.sort([kk] + list(rows), num_keys=1, is_stable=False)
        return srt[0][-1] + srt[1][-1]

    ms_sort = run(f_sort, (flat_key, *flat_rows))
    print(f"lax.sort (1 key + {n_rows - 1} payload): {ms_sort:8.2f} ms "
          f"({ms_sort / n * 1e6:.2f} ns/lane)", flush=True)

    def f_merge(*tt):
        out = ms.merge_sorted(list(tt), block=block, interpret=interp)
        return out[0, -1] + out[1, -1]

    t_merge = run(f_merge, tuple(tabs))
    print(f"pallas merge (k={k} tournament):        {t_merge:8.2f} ms "
          f"({t_merge / n * 1e6:.2f} ns/lane)", flush=True)

    # correctness cross-check on device
    out = np.asarray(jax.device_get(
        jax.jit(lambda *tt: ms.merge_sorted(
            list(tt), block=block, interpret=interp))(*tabs)))
    got = out[0, :n].view(np.float32).view(np.int32)
    want = np.sort(keys)
    err = int((got != want).sum())
    print(f"mismatched keys vs numpy: {err}")


if __name__ == "__main__":
    main()
