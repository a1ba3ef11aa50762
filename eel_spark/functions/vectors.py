"""Vector math over array<float|double> columns — JVM-side expressions.

Dot products and norms use ``zip_with`` + ``aggregate`` (sequential fold in
array order → deterministic, reproducible across cluster sizes). For
heavy all-pairs workloads the operators layer (eel_spark.operators.
similarity) bounds candidate generation; these kernels are the per-pair
cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i — left-to-right fold, deterministic."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot/(|a|·|b|); 0.0 for zero vectors."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / na / nb).otherwise(F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v))


def normalize(a: Column | str) -> Column:
    """Unit-normalize (pre-normalizing once turns cosine top-k into dot
    top-k — the right trade at 100 TB where each vector is read many
    times)."""
    n = norm(a)
    return F.when(n > 0, F.transform(_d(a), lambda x: x / n)).otherwise(_d(a))


def pack_sign_bits(a: Column | str, dim: int) -> Column:
    """Sign sketch: ceil(dim/64) bigint words; bit ``i`` of word ``w`` is
    set iff ``a[64*w + i] >= 0``.

    This is the 1-bit quantization of the vector (the hyperplane family
    of the embedding-LSH in operators/dedup.py, packed into machine
    words): 64 dims collapse to 8 bytes, and the angular distance between
    two vectors is estimated by the Hamming distance of their sketches —
    one ``xor`` + ``bit_count`` per word instead of ``dim`` float
    multiplies. Pure Catalyst: ``shiftleft`` is a bitwise op, so setting
    bit 63 never trips an ANSI overflow check the way ``acc * 2 + bit``
    folds would.
    """
    vec = F.col(a) if isinstance(a, str) else a

    def word(lo: int, hi: int) -> Column:
        # factory scope pins ``lo`` per word (a default-arg capture would
        # change the lambda's arity and break pyspark's HOF introspection)
        return F.aggregate(
            F.sequence(F.lit(lo), F.lit(hi)),
            F.lit(0).cast("long"),
            lambda acc, i: acc.bitwiseOR(
                F.when(
                    F.element_at(vec, i + 1) >= 0,
                    F.call_function(
                        "shiftleft", F.lit(1).cast("long"), (i - lo).cast("int")
                    ),
                ).otherwise(F.lit(0).cast("long"))
            ),
        )

    return F.array(
        *[
            word(w * 64, min(w * 64 + 64, dim) - 1)
            for w in range((dim + 63) // 64)
        ]
    )


def hamming(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two packed sign sketches (array<bigint>
    of equal length): Σ bit_count(a_w xor b_w)."""
    aw = F.col(a) if isinstance(a, str) else a
    bw = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(aw, bw, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 scalar quantization: struct(scale double,
    q array<tinyint>) with ``q_i = round(a_i / scale)``, ``scale =
    max|a| / 127``.

    4× (vs float32) / 8× (vs float64) smaller at rest and on the wire —
    the storage-side companion to ``pack_sign_bits``: sketches prefilter,
    int8 payloads rerank, full floats only for the final handful. A zero
    vector quantizes to scale 0 and dequantizes back to zeros.
    """
    v = _d(a)
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = absmax / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(a: Column | str) -> Column:
    """Inverse of ``quantize_int8``: array<double> ``q_i * scale``."""
    s = F.col(a) if isinstance(a, str) else a
    return F.transform(s["q"], lambda x: x.cast("double") * s["scale"])
