"""Property-based schema evolution: ARBITRARY interleavings of merge /
rename / drop / re-add / add-with-defaults / widen / compact must match
a pure-Python field-identity model.

The model is Iceberg's field-id semantics distilled: a cell belongs to a
FIELD (identity), not a name — rename moves the name, drop retires the
identity, re-adding a name mints a fresh identity that reads None for
every pre-existing row, an initial-default stamps the new identity's
value for every row that already existed, a write-default is the fill
for every later whole-row image that doesn't provide the column, and a
type widening changes how bytes are read, never what they mean.
Hypothesis searches interleavings the unit tests don't enumerate
(rename→drop→re-add→rename-back, defaults before and after renames,
widen between merges, compaction at every point...).
"""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable

KEYS = ["k"]
COL_POOL = ["p1", "p2", "p3"]

# op space: merges write to whichever payload columns currently exist
op_strategy = st.one_of(
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),          # key
                st.sampled_from(["x", "y", "z", None]),    # value written
            ),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(st.just("rename"), st.integers(0, 5)),
    st.tuples(st.just("drop"), st.integers(0, 5)),
    st.tuples(st.just("add"), st.integers(0, 5)),
    st.tuples(st.just("add_default"), st.integers(0, 5)),
    st.tuples(st.just("widen"), st.just(0)),
    st.tuples(st.just("compact"), st.just(0)),
)


class Model:
    """Field-identity model of the table."""

    def __init__(self, cols):
        self._ids = itertools.count()
        self.live = {}      # logical name -> field id
        for c in cols:
            self.live[c] = next(self._ids)
        self.cells = {}     # (key, field_id) -> value
        self.rows = set()   # live keys
        self.dead = set()   # tombstoned keys
        self.wd = {}        # field id -> write-default (fill for omits)

    def merge(self, writes, col, nval):
        # WHOLE-ROW LWW, matching the engine: an update is a full row
        # image — every live column the batch does not provide is
        # written as its write-default if declared, else null (merge()
        # fills schema columns the batch predates, and the whole row
        # wins by lsn). A model that only touched `col` described
        # partial-update semantics, which is NOT this table's engine.
        for k, v in writes:
            self.rows.add(k)
            self.dead.discard(k)
            for c, fid in self.live.items():
                if c == col:
                    self.cells[(k, fid)] = v
                elif c == "n":
                    self.cells[(k, fid)] = nval
                else:
                    self.cells[(k, fid)] = self.wd.get(fid)

    def rename(self, old, new):
        self.live[new] = self.live.pop(old)

    def drop(self, name):
        del self.live[name]

    def add(self, name):
        self.live[name] = next(self._ids)

    def add_default(self, name, ival, wval):
        fid = next(self._ids)
        self.live[name] = fid
        if wval is not None:
            self.wd[fid] = wval
        # initial-default: every row that already exists (its winning
        # image predates the column) reads the default
        for k in self.rows:
            self.cells[(k, fid)] = ival

    def state(self):
        out = {}
        for k in self.rows:
            out[k] = {
                c: self.cells.get((k, fid))
                for c, fid in self.live.items()
            }
        return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_strategy, min_size=1, max_size=8))
def test_evolution_sequences_match_field_identity_model(
    spark, tmp_path_factory, ops
):
    tmp = tmp_path_factory.mktemp("evo")
    schema = T.StructType(
        [T.StructField("k", T.StringType(), False)]
        + [T.StructField(c, T.StringType(), True) for c in COL_POOL[:2]]
        # an int column for the widen op; protected from rename/drop so
        # every generated sequence can exercise int-file-read-as-long
        + [T.StructField("n", T.IntegerType(), True)]
    )
    t = MiniLakeTable.create(
        spark, str(tmp / "t"), schema, key_cols=KEYS, n_buckets=2,
        write_mode="mor",
    )
    model = Model(COL_POOL[:2] + ["n"])
    lsn = itertools.count(1)
    batch = itertools.count()
    widened = False

    for op, arg in ops:
        cols = sorted(model.live)
        mut_cols = [c for c in cols if c != "n"]  # rename/drop targets
        if op == "merge":
            col = mut_cols[0] if mut_cols else None
            if col is None:
                continue
            writes = arg
            nval = next(lsn) % 97
            rows = [(k, v, nval, next(lsn), "U") for k, v in writes]
            df = spark.createDataFrame(
                rows, f"k string, {col} string, n int, lsn long, op string"
            )
            t.merge(df, batch_id=next(batch))
            model.merge(writes, col, nval)
        elif op == "rename":
            if not mut_cols:
                continue
            old = mut_cols[arg % len(mut_cols)]
            # the fallback pool must exclude names already live — a
            # rename to an occupied name correctly raises in the engine,
            # and the generator's job is to produce VALID interleavings
            candidates = [
                c
                for c in COL_POOL + ["q1", "q2", "q3"]
                if c not in cols
            ]
            if not candidates:
                continue
            new = candidates[arg % len(candidates)]
            t.rename_column(old, new)
            model.rename(old, new)
        elif op == "drop":
            if not mut_cols:
                continue
            name = mut_cols[arg % len(mut_cols)]
            t.drop_column(name)
            model.drop(name)
        elif op == "add":
            candidates = [c for c in COL_POOL if c not in cols]
            if not candidates:
                continue
            name = candidates[arg % len(candidates)]
            t.add_columns([T.StructField(name, T.StringType(), True)])
            model.add(name)
        elif op == "add_default":
            candidates = [c for c in COL_POOL if c not in cols]
            if not candidates:
                continue
            name = candidates[arg % len(candidates)]
            ival = ["d1", "d2"][arg % 2]
            wval = [None, "w1", "w2"][arg % 3]
            t.add_columns(
                [T.StructField(name, T.StringType(), True)],
                defaults={name: ival},
                write_defaults={name: wval} if wval is not None else None,
            )
            model.add_default(name, ival, wval)
        elif op == "widen":
            if widened:
                continue
            t.widen_column_type("n", T.LongType())
            widened = True  # model: a widen changes no value
        elif op == "compact":
            t.compact(drop_tombstones=False)

    got = {
        r["k"]: {c: r[c] for c in sorted(model.live)}
        for r in t.read().collect()
    }
    assert got == model.state()
