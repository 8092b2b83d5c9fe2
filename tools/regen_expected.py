#!/usr/bin/env python3
"""Regenerate the pinned-output oracles under fixtures/expected/.

The fixture parsers (bibtex, JATS XML, nested-JSON sections, the assembled
fulltext pipeline) have no DuckDB-SQL formulation, so their oracles are
golden CSVs of hand-verified output. After an INTENTIONAL semantic change:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/regen_expected.py /tmp/verify_out

then eyeball the git diff of fixtures/expected/ against the fixture sources
before committing — the point of a golden file is that changes are reviewed,
never auto-accepted.
"""
import sys
import duckdb

QUERIES = [
    "bib_scan", "jats_parse", "fulltext_sections",
    "chunk_by_section", "pipeline_fulltext", "pipeline_failures",
    "jats_abstract",
]

def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    for q in QUERIES:
        rel = duckdb.sql(f"SELECT * FROM '{out_dir}/{q}/*.parquet'")
        df = rel.df()
        # a null in an int column makes pandas float64 ("523.0") — restore
        # nullable Int64, driven by the PARQUET schema (not by whether the
        # values happen to be integral, which would mispin a genuinely
        # fractional column that is all-integral at fixture scale)
        int_cols = {c for c, t in zip(rel.columns, rel.types)
                    if str(t) in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                                  "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")}
        for c in df.columns:
            if c in int_cols and df[c].dtype == "float64":
                df[c] = df[c].astype("Int64")
        path = f"/root/repo/fixtures/expected/{q}.csv"
        df.to_csv(path, index=False, na_rep="\\N")
        print(f"{q}: {df.shape[0]} rows -> {path}")

if __name__ == "__main__":
    main()
