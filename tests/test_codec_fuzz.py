"""Decoder robustness under adversarial bytes: every multimodal decoder
must SKIP arbitrary corruption — truncations, bit flips, spliced
payloads, random garbage — and never throw out of the mapInPandas batch
or emit a wrong-schema row. This pins the 100 TB operational claim
('a corrupt blob never kills the job') with bulk evidence, not three
hand-picked cases. Deterministic seed; one Spark job per decoder."""

from __future__ import annotations

import random

from db_loader_spark.functions.multimodal import (
    decode_audio,
    decode_image,
    decode_jpeg,
    decode_png,
    synth_bmp,
    synth_jpeg,
    synth_png,
    synth_wav,
)

N_MUTANTS = 120


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mutants(good: bytes, seed: int) -> list[bytes]:
    """Deterministic corruption battery around one valid payload."""
    rng = random.Random(seed)
    out = []
    for i in range(N_MUTANTS):
        kind = i % 4
        b = bytearray(good)
        if kind == 0:  # truncate anywhere (including mid-header)
            out.append(bytes(b[: rng.randrange(0, len(b))]))
        elif kind == 1:  # flip 1-4 random bytes
            for _ in range(rng.randrange(1, 5)):
                p = rng.randrange(len(b))
                b[p] ^= rng.randrange(1, 256)
            out.append(bytes(b))
        elif kind == 2:  # splice two halves at misaligned offsets
            cut = rng.randrange(1, len(b))
            out.append(bytes(b[cut:] + b[:cut]))
        else:  # pure noise of assorted lengths
            out.append(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200))))
    return out


def _fuzz(spark, synth, decode, seed):
    good = bytes(synth(_docs(spark, [(3, "fuzz seed doc")])).collect()[0].payload)
    payloads = [(0, good)] + [
        (i + 1, m) for i, m in enumerate(_mutants(good, seed))
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = decode(df).collect()  # must not raise
    ids = [r.doc_id for r in rows]
    # the intact payload always decodes; mutants either decode (a flip
    # that missed every load-bearing byte) or are silently skipped
    assert 0 in ids
    assert set(ids) <= set(range(len(payloads)))
    return len(ids)


def test_fuzz_png_decoder(spark):
    survivors = _fuzz(spark, synth_png, decode_png, seed=101)
    # CRC32 per chunk: byte flips are almost always detected
    assert survivors >= 1


def test_fuzz_jpeg_decoder(spark):
    assert _fuzz(spark, synth_jpeg, decode_jpeg, seed=202) >= 1


def test_fuzz_bmp_decoder(spark):
    assert _fuzz(spark, synth_bmp, decode_image, seed=303) >= 1


def test_fuzz_wav_decoder(spark):
    assert _fuzz(spark, synth_wav, decode_audio, seed=404) >= 1
