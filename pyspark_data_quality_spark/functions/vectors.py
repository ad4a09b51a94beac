"""Vector column functions over ``array<float|double>`` embeddings.

All JVM-side higher-order functions (``zip_with`` / ``aggregate``) — no
Python UDF, no Arrow hop — so similarity math stays inside whole-stage
codegen and scales linearly with rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vector_dim(df: DataFrame, vec_col: str, dim: int | None = None) -> int | None:
    """Resolve the embedding dimensionality WITHOUT a Spark job when the
    caller supplies ``dim`` (the scale path — plan construction must not
    fire actions). Fallback: probe one non-null row (one small Spark job,
    documented); returns None on an empty/all-null column so callers can
    short-circuit to an empty result instead of crashing on ``len(None)``.
    """
    if dim is not None:
        return int(dim)
    row = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    return None if row is None else len(row[0])


def hyperplane_keys_np(tables: list[list[list[float]]]):
    """Arrow-vectorized hyperplane LSH keys: a pandas_udf mapping a vector
    column to ``array<long>`` (one bucket key per table).

    Why a UDF here: higher-order-function expressions (zip_with/aggregate)
    are evaluated per-element INTERPRETED — tables x planes x dim ops/row
    (4608 at 6x12x64) made key computation the measured bottleneck of the
    LSH operators. One batched matrix multiply (rows x dim @ dim x T*P)
    replaces all of it; the Arrow hop transfers only the vector column.
    The expression path (:func:`hyperplane_bucket_keys`) remains for
    UDF-free deployments.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    num_tables = len(tables)
    num_planes = len(tables[0])
    planes = np.asarray(tables, dtype=np.float64).reshape(
        num_tables * num_planes, -1
    )
    weights = (1 << np.arange(num_planes, dtype=np.int64))

    def keys(v):
        out = [None] * len(v)
        valid = [i for i, x in enumerate(v) if x is not None and len(x) > 0]
        if valid:
            mat = np.vstack([np.asarray(v.iloc[i], dtype=np.float64) for i in valid])
            bits = (mat @ planes.T) > 0  # (n, tables*planes)
            bits = bits.reshape(len(valid), num_tables, num_planes)
            ks = (bits * weights).sum(axis=2).astype(np.int64)  # (n, tables)
            for row, i in enumerate(valid):
                out[i] = ks[row].tolist()
        return pd.Series(out)

    # Real annotation objects (this module uses `from __future__ import
    # annotations`, which would stringify inline hints and break pyspark's
    # pandas_udf signature inspection).
    keys.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # asNondeterministic on every kernel factory here: the functions ARE
    # deterministic, but the marking stops Catalyst from DUPLICATING the
    # expensive kernel when it pushes a filter through — explode()'s
    # implicit size>0 condition otherwise plans a second ArrowEvalPython
    # below the exchange whose output is projected away (measured 2x the
    # kernel per action on the shingle pipelines, r15-opt).
    return pandas_udf(keys, "array<long>").asNondeterministic()


def hyperplane_keys_seq_np(tables: list[list[list[float]]]):
    """Arrow-vectorized hyperplane LSH keys with DIM-SEQUENTIAL
    accumulation — bit-identical to the interpreted expression fold
    (:func:`hyperplane_bucket_keys`) and to a SQL engine's left-to-right
    ``list_dot_product``, but vectorized over rows.

    Why it exists (r15): the certification faces need the fold's exact
    accumulation order (``((0+x0*w0)+x1*w1)+...``) so a DuckDB oracle
    replays the sign bits value-for-value, but the expression fold costs
    a FIXED ~1s per action in driver-side plan work (tables x planes x
    dim literal tree re-optimized every run) regardless of row count.
    Here the planes live in the kernel closure — no plan bloat — and
    ``acc += M[:, j] * w[p, j]`` accumulates over dims in the identical
    IEEE order for every row at once. The batched-matmul kernel
    (:func:`hyperplane_keys_np`) stays the production path; its BLAS
    accumulation order is unspecified, which is fine when no oracle
    replays the bits.

    Output matches the expression path's shape AND semantics exactly:
    ``array<struct<t:int, k:bigint>>``, MSB-first packing (``acc*2 +
    bit``), and ``k=0`` for a NULL vector, a wrong-width vector, or a
    vector with NULL elements — in the fold every such dot degenerates
    to NULL (NULL array / NULL-padded or NULL-propagated products), and
    ``when(NULL > 0, 1).otherwise(0)`` yields bit 0 on every plane.
    Here a NULL element becomes NaN, NaN poisons the accumulator, and
    ``NaN > 0`` is likewise false on every plane — same key 0.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    num_tables = len(tables)
    num_planes = len(tables[0])
    dim = len(tables[0][0])
    planes = np.asarray(tables, dtype=np.float64).reshape(
        num_tables * num_planes, dim
    )
    # MSB-first: plane 0 is the highest bit, exactly acc*2 + bit
    msb_weights = 1 << np.arange(num_planes - 1, -1, -1, dtype=np.int64)

    def keys(v):
        out = [None] * len(v)
        valid = []
        for i, x in enumerate(v):
            if x is None or len(x) != dim:
                # the fold's NULL dot -> bit 0 on every plane -> key 0
                out[i] = [(t, 0) for t in range(num_tables)]
            else:
                valid.append(i)
        if valid:
            mat = np.vstack(
                [
                    np.asarray(
                        v.iloc[i], dtype=np.float64
                    )  # NULL element -> NaN -> poisons acc -> key 0
                    for i in valid
                ]
            )
            acc = np.zeros((len(valid), num_tables * num_planes))
            for j in range(dim):
                # one elementwise multiply-add per dim: every row/plane
                # accumulates in the same left-to-right IEEE order as
                # the expression fold and the oracle's list_dot_product
                acc += mat[:, j : j + 1] * planes[:, j]
            bits = (acc > 0).reshape(len(valid), num_tables, num_planes)
            ks = (bits * msb_weights).sum(axis=2).astype(np.int64)
            for row, i in enumerate(valid):
                out[i] = [(t, int(k)) for t, k in enumerate(ks[row])]
        return pd.Series(out)

    keys.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # deterministic in fact; see hyperplane_keys_np for why it's marked
    return pandas_udf(keys, "array<struct<t:int,k:bigint>>").asNondeterministic()


def shingle_hashes_np(
    shingle: str = "word",
    n: int = 3,
    seed: int = 42,
    hash_family: str = "blake2b",
):
    """Arrow-vectorized shingling: a pandas_udf mapping a text column to
    the DISTINCT 64-bit shingle hashes (``array<long>``; NULL when the text
    yields no shingles).

    Normalization matches :func:`..functions.text.normalize_text` (lower,
    collapse whitespace, trim); shingles are ``n``-word joins or char
    n-grams. Why a UDF: building shingle STRINGS with
    slice/array_join expressions is interpreted per element and dominated
    the MinHash pipeline; here the strings never materialize in the plan —
    downstream MinHash and Jaccard verification run on the hash arrays.

    ``hash_family``:

    - ``'blake2b'`` (default, the scale path): salted blake2b-8
      (deterministic across workers, unlike Python's ``hash``).
    - ``'md5'``: the engine-portable certification family — h(s) =
      first 15 hex chars of ``md5("{seed}:" + s)`` as a non-negative
      60-bit BIGINT, replayable verbatim in DuckDB as
      ``CAST(concat('0x', substr(md5(concat('{seed}:', s)), 1, 15))
      AS BIGINT)`` (same trade as mmd_drift's ``weights='md5'``:
      slower hashing bought full SQL-oracle certification).
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if hash_family not in ("blake2b", "md5"):
        raise ValueError(
            f"shingle_hashes_np: hash_family must be 'blake2b' or 'md5', "
            f"got {hash_family!r}"
        )
    from .text import py_normalize_text, py_tokenize

    salt = seed.to_bytes(8, "little", signed=True)
    md5_prefix = f"{seed}:".encode()

    if hash_family == "md5":
        def one_hash(s: str) -> int:
            return int(
                hashlib.md5(md5_prefix + s.encode("utf-8")).hexdigest()[:15],
                16,
            )
    else:
        def one_hash(s: str) -> int:
            return int.from_bytes(
                hashlib.blake2b(
                    salt + s.encode("utf-8"), digest_size=8
                ).digest(),
                "little",
                signed=True,
            )

    def f(texts):
        out = [None] * len(texts)
        for i, t in enumerate(texts):
            if t is None:
                continue
            if shingle == "word":
                toks = py_tokenize(t)
                if len(toks) < n:
                    continue
                items = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
            else:
                norm = py_normalize_text(t)
                if len(norm) < n:
                    continue
                items = {norm[j : j + n] for j in range(len(norm) - n + 1)}
            out[i] = [one_hash(s) for s in items]
        return pd.Series(out)

    f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    # deterministic in fact; see hyperplane_keys_np for why it's marked
    return pandas_udf(f, "array<long>").asNondeterministic()


def minhash_md5_np(num_hashes: int = 24, seed: int = 42):
    """Engine-portable MinHash signature from md5-family shingle hashes:
    a pandas_udf mapping ``array<long>`` (md5-family hashes from
    :func:`shingle_hashes_np` with ``hash_family='md5'``) to the
    ``array<long>`` signature with ``sig[i] = min over h of
    md5int("{seed}:{i}:{h}")`` where ``md5int`` = first 15 hex chars as
    BIGINT and ``{h}`` is the decimal string of the shingle hash.

    Every step is replayable in DuckDB SQL (list comprehension over
    ``range(num_hashes)`` + ``md5(concat(...))``), which is the whole
    point: the full signature→banding→candidate→verify pipeline gets a
    value-level DuckDB oracle instead of recall floors. ~num_hashes
    md5 calls per shingle — bound the input (the certification entries
    use a fixed 500-doc subset); the scale path stays
    :func:`minhash_rehash_np`.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    prefixes = [f"{seed}:{i}:".encode() for i in range(num_hashes)]

    def sig(hashes):
        out = [None] * len(hashes)
        for row, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                continue
            encoded = [str(int(h)).encode() for h in hs]
            out[row] = [
                min(
                    int(hashlib.md5(p + e).hexdigest()[:15], 16)
                    for e in encoded
                )
                for p in prefixes
            ]
        return pd.Series(out)

    sig.__annotations__ = {"hashes": pd.Series, "return": pd.Series}
    # deterministic in fact; see hyperplane_keys_np for why it's marked
    return pandas_udf(sig, "array<long>").asNondeterministic()


def simhash_np(seed: int = 42, hash_family: str = "blake2b"):
    """Arrow-vectorized 64-bit SimHash of the token multiset: a pandas_udf
    mapping text to BIGINT (NULL for token-less text).

    Same construction as :func:`..operators.dedup.simhash` (bit j set iff
    the +1/-1 vote sum over token-hash bit j is positive) with a salted
    blake2b-8 token hash; the 64 x tokens vote matrix is one numpy
    broadcast instead of 64 interpreted aggregate passes per row.

    ``hash_family='md5'``: the engine-portable certification family —
    token hash = first 16 hex chars of ``md5("{seed}:" + tok)`` as
    uint64, replayable in DuckDB as ``CAST(concat('0x',
    substr(md5(concat('{seed}:', t)), 1, 16)) AS UBIGINT)`` so the
    whole simhash→banding→hamming pipeline gets a value-level oracle
    (dq_simhash_pairs; same trade as the MinHash md5 face).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .text import py_tokenize

    if hash_family not in ("blake2b", "md5"):
        raise ValueError(
            f"simhash_np: hash_family must be 'blake2b' or 'md5', "
            f"got {hash_family!r}"
        )
    salt = seed.to_bytes(8, "little", signed=True)
    md5_prefix = f"{seed}:".encode()
    bit_idx = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << bit_idx

    if hash_family == "md5":
        def one_hash(x: str) -> int:
            return int(
                hashlib.md5(md5_prefix + x.encode("utf-8")).hexdigest()[:16],
                16,
            )
    else:
        def one_hash(x: str) -> int:
            return int.from_bytes(
                hashlib.blake2b(
                    salt + x.encode("utf-8"), digest_size=8
                ).digest(),
                "little",
            )

    def f(texts):
        out = [None] * len(texts)
        for i, t in enumerate(texts):
            if t is None:
                continue
            toks = py_tokenize(t)
            if not toks:
                continue
            hs = np.array([one_hash(x) for x in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            packed = (weights * (votes > 0)).sum(dtype=np.uint64)
            out[i] = int(packed.astype(np.int64))
        return pd.Series(out)

    f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    # deterministic in fact; see hyperplane_keys_np for why it's marked
    return pandas_udf(f, "long").asNondeterministic()


def minhash_rehash_np(num_hashes: int = 64, seed: int = 42):
    """Arrow-vectorized MinHash from pre-hashed shingles: a pandas_udf
    mapping ``array<bigint>`` (one xxhash64 per shingle, computed JVM-side
    where string hashing is cheap) to the ``array<bigint>`` signature.

    Hash family: h_i = a_i * h + b_i over Z_2^64 (odd a_i), the standard
    multiply-shift rehash — one hash of the string, num_hashes integer
    mixes, all in one numpy broadcast per row instead of num_hashes
    interpreted tree-walks per shingle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(seed)
    a = (rng.randint(0, 2**63, size=num_hashes).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.randint(0, 2**63, size=num_hashes).astype(np.uint64)

    def sig(hashes):
        out = [None] * len(hashes)
        with np.errstate(over="ignore"):
            for i, h in enumerate(hashes):
                if h is None or len(h) == 0:
                    continue
                hh = np.asarray(h, dtype=np.int64).astype(np.uint64)
                mixed = a[:, None] * hh[None, :] + b[:, None]  # wraps mod 2^64
                out[i] = mixed.min(axis=1).astype(np.int64).tolist()
        return pd.Series(out)

    sig.__annotations__ = {"hashes": pd.Series, "return": pd.Series}
    # deterministic in fact; see hyperplane_keys_np for why it's marked
    return pandas_udf(sig, "array<long>").asNondeterministic()


def hyperplane_bucket_keys(vec: Column, tables: list[list[list[float]]]) -> Column:
    """Random-hyperplane LSH bucket keys: ``array<struct<t:int, k:bigint>>``,
    one entry per table; key bit i = sign of dot(vec, plane_i).

    The hyperplanes are ONE nested array literal (constant-folded by
    Catalyst) traversed with zip_with/aggregate lambdas — a single folded
    expression regardless of tables x planes, instead of one aggregate tree
    per plane (72 trees at 6x12 made codegen the bottleneck, not the math).
    """
    tbls = F.array(
        *[
            F.array(
                *[F.array(*[F.lit(float(w)) for w in plane]) for plane in planes]
            )
            for planes in tables
        ]
    )
    return F.zip_with(
        tbls,
        F.sequence(F.lit(0), F.lit(len(tables) - 1)),
        lambda planes, t: F.struct(
            t.cast("int").alias("t"),
            F.aggregate(
                planes,
                F.lit(0).cast("long"),
                # MSB-first bit packing: acc*2 + sign-bit. num_planes <= 62
                # so the long never overflows.
                lambda acc, plane: acc * 2
                + F.when(
                    F.aggregate(
                        F.zip_with(vec, plane, lambda x, w: x * w),
                        F.lit(0.0).cast("double"),
                        lambda a, v: a + v,
                    )
                    > 0,
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            ).alias("k"),
        ),
    )


def md5_uniform(tag: str) -> float:
    """Engine-replayable uniform in (0, 1): ``(int(md5(tag)[:6], 16) +
    0.5) / 2^24`` (the +0.5 keeps ln() off exact 0). THE
    certification-critical formula shared by every md5-derived random
    family — RFF weights (operators/drift.py _md5_rff_weights) and LSH
    hyperplanes alike; any change here must be mirrored in every
    oracle SQL that replays it."""
    import hashlib

    k = int(hashlib.md5(tag.encode()).hexdigest()[:6], 16)
    return (k + 0.5) / 16777216.0


def md5_gauss(tag1: str, tag2: str) -> float:
    """Standard-normal draw via Box–Muller over two :func:`md5_uniform`
    tags — replayable as ``sqrt(-2*ln(u1)) * cos(2*pi()*u2)`` in any
    engine with md5/ln/cos."""
    import math as _math

    return _math.sqrt(-2.0 * _math.log(md5_uniform(tag1))) * _math.cos(
        2.0 * _math.pi * md5_uniform(tag2)
    )


def md5_hyperplanes(
    num_tables: int, num_planes: int, dim: int, seed: int = 42
) -> list[list[list[float]]]:
    """Engine-replayable random hyperplanes: :func:`md5_gauss` draws
    with tags ``hp1|seed|t|p|j`` / ``hp2|seed|t|p|j`` — the dq_mmd
    ``weights='md5'`` construction applied to hyperplane LSH, so a
    DuckDB oracle can rebuild every plane weight bit-for-bit
    (libm-level) and replay the whole bucketing
    (dq_embedding_pairs_lsh, dq_lsh_topk). Driver-side,
    parameter-bounded: tables x planes x dim md5 calls."""
    return [
        [
            [
                md5_gauss(f"hp1|{seed}|{t}|{p}|{j}", f"hp2|{seed}|{t}|{p}|{j}")
                for j in range(dim)
            ]
            for p in range(num_planes)
        ]
        for t in range(num_tables)
    ]


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has a zero or
    NON-FINITE norm. The finite guard matters for ranking: an Inf
    element (or a magnitude whose square overflows) makes the norm Inf
    and the ratio NaN, and Spark orders NaN ABOVE every real double —
    one damaged vector would rank as the #1 neighbor of every query.
    NULL instead sorts last under the DESC windows all the top-k paths
    use."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    c = F.when(
        (n > 0) & ~F.isnan(n) & (n < F.lit(float("inf"))), d / n
    )
    # belt over braces: mask any residual NaN from the division itself
    return F.when(~F.isnan(c), c)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged (avoid div-0)."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda v: v / n)).otherwise(a)
