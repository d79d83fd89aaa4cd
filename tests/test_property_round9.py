"""Property differentials for the round-8 continuation operators that only
had directed tests (round-9 verdict item 7): schema-evolution parquet scans
(random column-add generations vs a pure-Python union-with-NULL-fill
reference) and the persistent IVF lifecycle (build→save→add→load→query on
random vectors vs NumPy brute force, plus loaded-assignment equivalence to
an in-memory assignment under the same frozen centroids). Derandomized like
the other property files so a pass is reproducible.
"""

from __future__ import annotations

import uuid

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ----------------------------------------------------- schema evolution scan


@st.composite
def evolution_cases(draw):
    """2-3 parquet generations over a growing column pool: every generation
    carries the key; optional columns appear in later generations (the
    column-ADD lake reality scan_schema_evolution declares). Generations
    may be EMPTY — an empty file still contributes its footer schema to
    the merge."""
    optional = ["a", "b"]
    n_gens = draw(st.integers(2, 3))
    gens, next_key = [], 0
    for g in range(n_gens):
        # later generations carry a (non-strict) superset progression:
        # each optional column independently present, but column-adds are
        # what the mergeSchema path is for, so bias presence by generation
        cols = [c for i, c in enumerate(optional) if draw(st.booleans()) or (g > i)]
        n_rows = draw(st.integers(0, 5))
        rows = []
        for _ in range(n_rows):
            row = {"k": next_key}
            next_key += 1
            if "a" in cols:
                row["a"] = draw(st.one_of(st.none(), st.integers(-9, 9)))
            if "b" in cols:
                row["b"] = draw(st.one_of(st.none(), st.sampled_from(["x", "yy", ""])))
            rows.append(row)
        gens.append((cols, rows))
    return gens


def _gen_schema(cols):
    fields = [T.StructField("k", T.LongType())]
    if "a" in cols:
        fields.append(T.StructField("a", T.LongType()))
    if "b" in cols:
        fields.append(T.StructField("b", T.StringType()))
    return T.StructType(fields)


@given(evolution_cases())
@settings(**_SETTINGS)
def test_merge_schema_scan_matches_python(spark, tmp_path_factory, gens):
    out = str(tmp_path_factory.mktemp("schema_evo") / uuid.uuid4().hex)
    all_cols = sorted({"k"} | {c for cols, _ in gens for c in cols})
    for i, (cols, rows) in enumerate(gens):
        schema = _gen_schema(cols)
        df = spark.createDataFrame(
            [tuple(r.get(f.name) for f in schema.fields) for r in rows], schema
        )
        df.write.mode("overwrite" if i == 0 else "append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    # merged schema = union of every generation's footer schema, even from
    # 0-row files; old files back-fill NULL for columns they predate
    assert sorted(merged.columns) == all_cols
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    got = sorted(
        (tuple(row[c] for c in all_cols) for row in merged.collect()),
        key=nullsafe,
    )
    expected = sorted(
        (tuple(r.get(c) for c in all_cols) for _, rows in gens for r in rows),
        key=nullsafe,
    )
    assert got == expected


# -------------------------------------------------- persistent IVF lifecycle


@st.composite
def ivf_chains(draw):
    """Base vectors + 1-2 add batches (possibly empty) of small-integer
    4-d vectors — integer components make every dot product exact, so the
    4dp rounding can never straddle an engine-specific midpoint."""
    dim = 4

    def vec():
        return [float(draw(st.integers(-3, 3))) for _ in range(dim)]

    n_base = draw(st.integers(3, 12))
    base = [(i, vec()) for i in range(n_base)]
    batches, next_id = [], n_base
    for _ in range(draw(st.integers(1, 2))):
        n = draw(st.integers(0, 6))
        batches.append([(next_id + j, vec()) for j in range(n)])
        next_id += n
    query = vec()
    return base, batches, query


@given(ivf_chains())
@settings(**_SETTINGS)
def test_persistent_ivf_chain_matches_numpy(spark, tmp_path_factory, case):
    from sql4pandas_spark.operators.similarity import (
        _assign_to_cells,
        add_to_ivf_index,
        build_ivf_index,
        ivf_query_topk,
        load_ivf_index,
        save_ivf_index,
    )

    base, batches, query = case
    root = str(tmp_path_factory.mktemp("ivf_chain") / uuid.uuid4().hex)
    schema = "vec_id long, embedding array<double>"
    n_cells, k = 4, 5

    emb_base = spark.createDataFrame(base, schema)
    index = build_ivf_index(emb_base, n_cells=n_cells)
    save_ivf_index(index, root)
    for b, batch in enumerate(batches, start=1):
        add_to_ivf_index(spark.createDataFrame(batch, schema), root, batch_id=b)

    full_rows = base + [r for batch in batches for r in batch]
    emb_full = spark.createDataFrame(full_rows, schema)
    loaded = load_ivf_index(emb_full, root)

    # (1) full-probe query through the save→add→load chain == NumPy brute
    # force over every vector ever indexed (base + all add batches)
    got = [
        (r.vec_id, r.sim)
        for r in ivf_query_topk(loaded, query, k=k, n_probe=n_cells).collect()
    ]
    q = np.asarray(query)
    sims = [
        (vid, round(float(np.asarray(v) @ q), 4)) for vid, v in full_rows
    ]
    expected = sorted(sims, key=lambda t: (-t[1], t[0]))[:k]
    assert got == expected

    # (2) the on-disk assignment (base partitions + frozen-centroid add
    # partitions) == an in-memory assignment of the FULL table under the
    # SAME frozen centroids — adds never retrained the quantizer
    on_disk = {
        (r.vec_id, r.cell) for r in loaded.assigned.collect()
    }
    in_mem = {
        (r.vec_id, r.cell)
        for r in _assign_to_cells(emb_full, "vec_id", index.centroids).collect()
    }
    assert on_disk == in_mem
    assert len(on_disk) == len(full_rows)
