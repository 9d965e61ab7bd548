#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql (SURVEY.md §7.6.10).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Emulates the driver's check: for each query, read the Spark parquet
output and run the oracle SQL in DuckDB over views named after the 10
tables; sort columns by name; compare schema + row-ordered values.
"""
import glob, json, math, struct, sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Driver-faithful (r6 VERDICT task 2): tz-aware values are NOT
    # normalized to naive — the driver compares schemas as-is, and a
    # Spark session-tz timestamp vs a DuckDB ntz one is a real schema
    # mismatch (q_scd2_* escaped the r6 local sweep through exactly
    # this softening). Keep values as-is; tz diffs surface as typediff.
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Driver-faithful (r9 VERDICT task 1c): the driver hashes value
        # BYTES, where -0.0 != +0.0, while Python's == says they're
        # equal — q_williams_r/q_shift_share shipped red through exactly
        # this blindness. Compare floats by their IEEE-754 bit pattern.
        return struct.pack(">d", v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    t = pq.read_table(files[0])
    for f in files[1:]:
        import pyarrow as pa
        t = pa.concat_tables([t, pq.read_table(f)])
    return t


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = nskip = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        spark_t = load_spark(outdir, name)
        if spark_t is None:
            print(f"MISSING  {name}: no spark output")
            nfail += 1
            continue
        try:
            duck_t = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ORAERR   {name}: {str(e).splitlines()[0][:160]}")
            nfail += 1
            continue
        s_cols, d_cols = sorted(spark_t.column_names), sorted(duck_t.column_names)
        if s_cols != d_cols:
            print(f"COLS     {name}: spark={s_cols} duck={d_cols}")
            nfail += 1
            continue
        # Driver-faithful: the driver's pandas comparator dies in
        # sort_values on list-typed columns (q_feature_hash, r6) —
        # any array/list output column is a hard local failure so the
        # class is caught BEFORE the driver sees it.
        import pyarrow.types as pat
        listy = [c for c in s_cols
                 if pat.is_list(spark_t.schema.field(c).type)
                 or pat.is_large_list(spark_t.schema.field(c).type)]
        if listy:
            print(f"ARRAY    {name}: list-typed output cols {listy} — the "
                  f"driver comparator cannot sort these; emit array_join'd "
                  f"strings instead")
            nfail += 1
            continue
        def tnorm(t):
            import re
            # NOTE: tz markers are NOT stripped (r6 VERDICT task 2) —
            # tz-aware vs ntz must fail here exactly as the driver
            # fails it. Only list field naming/nullability (engine-
            # cosmetic) is normalized — moot while listy cols are
            # rejected above, kept for non-top-level nesting.
            t = re.sub(r"list<\w+: ([^>]+?)( not null)?>", r"list<\1>", t)
            return t
        stypes = {c: tnorm(str(spark_t.schema.field(c).type)) for c in s_cols}
        dtypes = {c: tnorm(str(duck_t.schema.field(c).type)) for c in d_cols}
        type_diff = {c: (stypes[c], dtypes[c]) for c in s_cols
                     if stypes[c] != dtypes[c]}
        if spark_t.num_rows != duck_t.num_rows:
            print(f"ROWS     {name}: spark={spark_t.num_rows} duck={duck_t.num_rows} typediff={type_diff}")
            nfail += 1
            continue
        srows = [tuple(norm(spark_t.column(c)[i].as_py()) for c in s_cols)
                 for i in range(spark_t.num_rows)]
        drows = [tuple(norm(duck_t.column(c)[i].as_py()) for c in d_cols)
                 for i in range(duck_t.num_rows)]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"VALS     {name}: {len(bad)}/{len(srows)} rows differ; first@{i}:")
            print(f"         cols : {s_cols}")
            print(f"         spark: {a}")
            print(f"         duck : {b}")
            if type_diff:
                print(f"         typediff: {type_diff}")
            nfail += 1
        elif type_diff:
            print(f"TYPES    {name}: values match ({len(srows)} rows) but dtypes differ: {type_diff}")
            nfail += 1
        else:
            print(f"PASS     {name} ({len(srows)} rows)")
            npass += 1
    print(f"\n== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
