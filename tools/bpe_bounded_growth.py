"""Growth evidence for the bounded-plan BPE encode (r8 verdict task 3).

The testdata corpus has a ~31-word vocabulary (merges exhaust at ~89),
so the scale measurement runs over a SYNTHETIC 50k-word vocabulary
(seeded, Zipf-ish lengths) with a >=1.5k-entry merge list built by
batched pair counting — every merge actually fires, and the list is
topologically ordered like a learned one.

Measured:
1. PLAN growth — the fold chain builds one chained projection per
   merge (build + first-execution time grows with merge count; the
   closed-form claim is that a real 32k-merge chain is unusable); the
   Arrow kernel is ONE mapInPandas node at any count.
2. ENCODE cost — kernel wall over the 50k-word table at 10/300/1500
   merges: grows with merges actually applied, never with plan size.
3. PARITY — kernel == fold chain on the synthetic vocabulary at 100
   merges (the per-word pin lives in tests/test_bpe_bounded.py).

Run: python tools/bpe_bounded_growth.py
"""

from __future__ import annotations

import random
import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

N_WORDS = 50_000
N_MERGES = 1_500


def synthetic_vocab(n: int = N_WORDS) -> list[str]:
    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    # skewed letter distribution so pair counts have a real head
    weights = [1.0 / (i + 1) for i in range(len(alphabet))]
    words = {
        "".join(
            rng.choices(alphabet, weights=weights, k=rng.randint(3, 16))
        )
        for _ in range(n)
    }
    return sorted(words)


def batched_merges(words: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Topologically valid merge list in O(levels) counting passes:
    per level, rank ALL adjacent pairs of the current token streams by
    frequency and append them in rank order, then apply the level
    before recounting.  Not interleaved textbook BPE, but every entry
    fires and later entries build on earlier ones — the cost shape a
    real learned list has."""
    toks = {w: list(w) for w in words}
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pairs: Counter = Counter()
        for t in toks.values():
            for i in range(len(t) - 1):
                pairs[(t[i], t[i + 1])] += 1
        fresh = [
            p
            for p, c in sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            if c >= 2
        ]
        if not fresh:
            break
        batch = fresh[: n_merges - len(merges)]
        merges.extend(batch)
        for w, t in toks.items():
            for left, right in batch:
                out: list[str] = []
                for x in t:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                t = out
            toks[w] = t
    return merges


def main() -> None:
    from prometheus_anomaly_detection_lstm_spark.operators import bpe
    from prometheus_anomaly_detection_lstm_spark.session import get_spark
    from prometheus_anomaly_detection_lstm_spark import shipping

    spark = get_spark("bpe-growth")
    spark.sparkContext.setLogLevel("ERROR")
    shipping.ensure_shipped(spark)

    words = synthetic_vocab()
    t0 = time.perf_counter()
    merges = batched_merges(words, N_MERGES)
    print(
        f"built {len(merges)} firing merges over {len(words)} words "
        f"in {time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    vocab = spark.createDataFrame(
        [(w,) for w in words], "word string"
    ).repartition(32).localCheckpoint()

    def wall(df, n: int = 2) -> float:
        vals = []
        for _ in range(n):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            vals.append(time.perf_counter() - t0)
        return round(min(vals), 3)

    print("\n-- fold chain growth (build + first-exec + warm, sec) --", flush=True)
    for n in (10, 100, 200):
        t0 = time.perf_counter()
        df = bpe.encode_word_tokens(vocab, merges[:n])
        built = round(time.perf_counter() - t0, 3)
        first = wall(df, 1)
        warm = wall(df, 2)
        print(
            f"fold   @ {n:>5} merges: build {built} first {first} warm {warm}",
            flush=True,
        )
        if first + warm > 60:
            print(
                "fold chain: stopping the sweep — already past a minute "
                "per pass; 32k merges is out of reach by extrapolation",
                flush=True,
            )
            break

    print("\n-- kernel (constant plan; synthetic tail pads the closure) --", flush=True)
    pad = [(f"①{i}", f"②{i}") for i in range(32_000)]
    for n, ms in [
        (10, merges[:10]),
        (N_MERGES, merges),
        (32_000, (merges + pad)[:32_000]),
    ]:
        df = bpe.encode_word_tokens_bounded(vocab, ms)
        first = wall(df, 1)
        warm = wall(df, 2)
        print(
            f"kernel @ {n:>5} merges: first {first} warm {warm}", flush=True
        )

    a = sorted(
        (r["word"], tuple(r["t"]))
        for r in bpe.encode_word_tokens(vocab, merges[:100]).collect()
    )
    b = sorted(
        (r["word"], tuple(r["t"]))
        for r in bpe.encode_word_tokens_bounded(vocab, merges[:100]).collect()
    )
    print(
        f"\nparity at 100 merges over {len(a)} words: "
        f"{'OK' if a == b else 'MISMATCH'}",
        flush=True,
    )


if __name__ == "__main__":
    main()
