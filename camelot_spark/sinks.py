"""Sinks: per-table exports + parsing report (K1/K2/K3).

Reference: ``Table.to_csv/to_json/to_html/to_excel/to_sqlite``
(`camelot/core.py:571-655`, pandas writers, one local file per table)
and ``TableList.export`` (`camelot/core.py:689-758`, one file per
``(page, order)``). Excel/SQLite are single-machine formats: their
sinks here are explicitly DRIVER-SIDE convenience exports over a
bounded, deterministic sample (``max_tables`` guard) — full-corpus
output goes to the distributed parquet/snapshot path.

Spark shape: everything below is built from array expressions on the
``extracted`` row (slice/transform/aggregate) — per-doc work stays
inside whole-stage codegen with NO shuffle and no Python; the write is
``partitionBy(doc_id)``, the distributed analogue of one-file-per-table.

Reconstruction invariant: cell spans are emitted as contiguous
row-major blocks, one block per entry of ``tables`` in array order, so
block i covers cells [Σ sizes[:i], Σ sizes[:i+1]). extract_document
guarantees the match by ordering ``tables`` with the same composite
key assemble_spans uses — (-bbox.bottom, bbox.left, parser order) —
which also covers bottom-y ties between side-by-side tables
(`extract_doc.tables_in_span_order`).

Deviation: ``to_json`` emits an array-of-rows-of-strings rather than
pandas' records orient (`core.py:589-607`) — the reference's record
keys are just stringified column indices, which JSON arrays carry
positionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell_texts():
    """Ordered cell-span texts of the doc as array<string>."""
    return F.transform(
        F.filter("spans", lambda s: s["kind"] == F.lit("cell")),
        lambda s: F.coalesce(s["text"], F.lit("")),
    )


def _table_rows_col(cells, t):
    """Rows (array<array<string>>) of one table struct ``t`` given the
    doc's flat cell array and this table's precomputed ``start``."""
    return F.transform(
        F.sequence(F.lit(0), t["nrows"] - 1),
        lambda r: F.slice(cells, t["start"] + r * t["ncols"] + 1, t["ncols"]),
    )


def _tables_with_offsets():
    """tables array enriched with each block's start offset in the
    doc's cell sequence (running sum of nrows*ncols)."""
    sizes_before = lambda i: F.aggregate(  # noqa: E731
        F.slice("tables", 1, i), F.lit(0), lambda acc, t: acc + t["nrows"] * t["ncols"]
    )
    return F.transform(
        "tables",
        lambda t, i: F.struct(
            t["order"].alias("order"),
            t["nrows"].alias("nrows"),
            t["ncols"].alias("ncols"),
            sizes_before(i).alias("start"),
        ),
    )


def table_rows(extracted: DataFrame) -> DataFrame:
    """(doc_id, table_order, rows array<array<string>>) — one row per
    extracted table, cells reassembled into the reference's grid shape
    (`camelot/core.py:364-370`)."""
    cells = _cell_texts()
    per_table = F.transform(
        _tables_with_offsets(),
        lambda t: F.struct(
            t["order"].alias("table_order"), _table_rows_col(cells, t).alias("rows")
        ),
    )
    return extracted.select(
        "doc_id", F.explode(per_table).alias("t")
    ).select("doc_id", "t.table_order", "t.rows")


def _csv_quote(c):
    """Minimal CSV quoting (RFC 4180): quote when the value contains a
    comma, quote or newline; double interior quotes."""
    needs = c.rlike('[",\n\r]')
    return F.when(
        needs, F.concat(F.lit('"'), F.regexp_replace(c, '"', '""'), F.lit('"'))
    ).otherwise(c)


def to_csv(extracted: DataFrame) -> DataFrame:
    """(doc_id, table_order, payload) with payload = the table as CSV
    text — `Table.to_csv` (`camelot/core.py:571-587`) semantics."""
    rows = table_rows(extracted)
    line = lambda r: F.array_join(F.transform(r, _csv_quote), ",")  # noqa: E731
    return rows.select(
        "doc_id",
        "table_order",
        F.array_join(F.transform("rows", line), "\n").alias("payload"),
    )


def to_json(extracted: DataFrame) -> DataFrame:
    """(doc_id, table_order, payload) — JSON array of rows of strings."""
    return table_rows(extracted).select(
        "doc_id", "table_order", F.to_json("rows").alias("payload")
    )


def to_html(extracted: DataFrame) -> DataFrame:
    """(doc_id, table_order, payload) — minimal <table> markup, the
    Spark-side analogue of `Table.to_html` (`camelot/core.py:609-625`)."""
    esc = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(F.regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"
    )
    tr = lambda r: F.concat(  # noqa: E731
        F.lit("<tr>"),
        F.array_join(F.transform(r, lambda c: F.concat(F.lit("<td>"), esc(c), F.lit("</td>"))), ""),
        F.lit("</tr>"),
    )
    return table_rows(extracted).select(
        "doc_id",
        "table_order",
        F.concat(
            F.lit("<table>"), F.array_join(F.transform("rows", tr), ""), F.lit("</table>")
        ).alias("payload"),
    )


_FORMATS = {"csv": to_csv, "json": to_json, "html": to_html}


def export(extracted: DataFrame, path: str, fmt: str = "csv", mode: str = "overwrite") -> None:
    """Bulk export — `TableList.export` (`camelot/core.py:689-735`).

    One output partition dir per doc (distributed analogue of one file
    per (page, order)); ``payload`` carries the rendered table.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"Format {fmt} is not supported (csv, json, html)")
    df = _FORMATS[fmt](extracted)
    df.write.mode(mode).partitionBy("doc_id").parquet(path)


def _collect_tables(extracted: DataFrame, max_tables: int):
    """Deterministically-ordered (doc_id, table_order, rows) sample for
    the single-machine sinks; refuses unbounded collects."""
    rows = (
        table_rows(extracted)
        .orderBy("doc_id", "table_order")
        .limit(max_tables + 1)
        .collect()
    )
    if len(rows) > max_tables:
        raise ValueError(
            f"to_excel/to_sqlite are driver-side sample exports; got more "
            f"than max_tables={max_tables} tables — filter the DataFrame "
            f"or raise max_tables explicitly, or use export() for the "
            f"distributed path")
    return rows


def _sheet_names(rows):
    """'page-{doc}-table-{order}' per the reference (`core.py:614,650`),
    bounded to Excel's 31-char sheet-name limit with a collision-proof
    numeric suffix (the counter advances every probe, so the loop
    terminates and the suffix always fits inside the 31 chars)."""
    names = []
    seen = set()
    for r in rows:
        base = f"page-{r['doc_id']}-table-{r['table_order']}"[:31]
        name, k = base, 0
        while name in seen:
            k += 1
            suffix = f"~{k}"
            name = base[:31 - len(suffix)] + suffix
        seen.add(name)
        names.append(name)
    return names


def to_sqlite(extracted: DataFrame, path: str, max_tables: int = 10000) -> int:
    """`Table.to_sqlite` (`camelot/core.py:637-655`): one SQLite table
    named page-{doc}-table-{order} per extracted table, columns "0".."n"
    of TEXT (the reference's pandas ``to_sql`` layout). Driver-side
    sample export; returns the number of tables written."""
    import sqlite3

    rows = _collect_tables(extracted, max_tables)
    names = _sheet_names(rows)
    conn = sqlite3.connect(path)
    written = 0
    try:
        for name, r in zip(names, rows):
            grid = r["rows"]
            ncols = len(grid[0]) if grid else 0
            if ncols == 0:
                # a zero-column CREATE TABLE is a SQLite syntax error;
                # an empty grid carries no data — skip, don't abort
                continue
            cols = ", ".join(f'"{i}" TEXT' for i in range(ncols))
            conn.execute(f'DROP TABLE IF EXISTS "{name}"')
            conn.execute(f'CREATE TABLE "{name}" ({cols})')
            ph = ", ".join("?" for _ in range(ncols))
            conn.executemany(f'INSERT INTO "{name}" VALUES ({ph})',
                             [tuple(row) for row in grid])
            written += 1
        conn.commit()
    finally:
        conn.close()
    return written


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;"))


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def to_excel(extracted: DataFrame, path: str, max_tables: int = 200) -> int:
    """`Table.to_excel` / `TableList.export(f='excel')`
    (`camelot/core.py:603-628,741-747`): one worksheet per table named
    page-{doc}-table-{order}, written as a minimal OOXML .xlsx (pure
    stdlib zipfile + inline strings — no openpyxl dependency).
    Driver-side sample export; returns the number of sheets written.

    Deviation: cells carry the raw grid (no pandas index/header rows)."""
    import zipfile

    rows = _collect_tables(extracted, max_tables)
    names = _sheet_names(rows)
    n = len(rows)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(n))
        + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>")
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        + "".join(
            f'<sheet name="{_xml_escape(nm)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, nm in enumerate(names))
        + "</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n))
        + "</Relationships>")

    def sheet_xml(grid) -> str:
        body = []
        for ri, row in enumerate(grid):
            cells = "".join(
                f'<c r="{_col_letter(ci)}{ri + 1}" t="inlineStr">'
                f"<is><t{' xml:space=' + chr(34) + 'preserve' + chr(34) if c != c.strip() else ''}>"
                f"{_xml_escape(c)}</t></is></c>"
                for ci, c in enumerate(row))
            body.append(f'<row r="{ri + 1}">{cells}</row>')
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(body)}</sheetData></worksheet>")

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, r in enumerate(rows):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(r["rows"]))
    return n


def parsing_report(extracted: DataFrame) -> DataFrame:
    """Per-table report — `Table.parsing_report` (`camelot/core.py:373-384`):
    accuracy / whitespace / order / page(≙doc_id), plus grid shape."""
    t = F.explode("tables")
    return extracted.select("doc_id", t.alias("t")).select(
        "doc_id",
        F.col("t.order").alias("table_order"),
        F.round("t.accuracy", 2).alias("accuracy"),
        F.round("t.whitespace", 2).alias("whitespace"),
        F.col("t.nrows").alias("nrows"),
        F.col("t.ncols").alias("ncols"),
    )


def lineage_report(extracted: DataFrame) -> DataFrame:
    """Per-partition operational report from the lineage struct every
    extracted row carries (north_rule: "per-partition lineage +
    metrics"): docs processed, error count, total/max kernel time, span
    volume — the table an operator reads to find the slow or poisoned
    partition of a 10^12-doc run. One partial-aggregated groupBy on a
    small int key; never touches span bodies."""
    return (
        extracted.groupBy(F.col("lineage.partition_id").alias("partition_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("lineage.error").isNotNull(), 1).otherwise(0))
            .cast("bigint").alias("n_errors"),
            F.sum("lineage.elapsed_us").cast("bigint").alias("elapsed_us"),
            F.max("lineage.elapsed_us").cast("bigint").alias("max_doc_us"),
            F.sum("lineage.n_input_spans").cast("bigint").alias("n_input_spans"),
            F.sum("n_tables").cast("bigint").alias("n_tables"),
        )
        .select(F.col("partition_id").cast("int").alias("partition_id"),
                "n_docs", "n_errors", "elapsed_us", "max_doc_us",
                "n_input_spans", "n_tables")
    )


def span_stats(extracted: DataFrame) -> DataFrame:
    """Per-document QA over the interleaved span sequence — the output
    contract the north rule grades on (span-sequence equality of
    (kind, text, media_ref, order)) turned into an auditable table:
    per-kind counts and text volume, media-ref integrity (every media
    span must carry a ref), and order contiguity (orders are exactly
    0..n-1). A downstream consumer checks this table instead of
    re-walking 10^12 span arrays.

    Pure per-row array folds — zero shuffle, scan-local; the whole
    operator lives in one codegen stage."""
    spans = F.col("spans")

    def of_kind(k):
        return F.filter(spans, lambda s: s["kind"] == F.lit(k))

    def chars(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"),
            lambda a, s: a + F.length(F.coalesce(s["text"], F.lit(""))))

    orders = F.transform(spans, lambda s: s["order"].cast("long"))
    contiguous = (
        (F.size(spans) == 0)
        | (
            (F.array_min(orders) == 0)
            & (F.array_max(orders) == F.size(spans) - 1)
            & (F.size(F.array_distinct(orders)) == F.size(spans))
        )
    )
    media = of_kind("media")
    media_ok = F.forall(media, lambda s: s["media_ref"].isNotNull())
    return extracted.select(
        "doc_id",
        F.size(spans).cast("bigint").alias("n_spans"),
        F.size(of_kind("cell")).cast("bigint").alias("n_cells"),
        F.size(of_kind("prose")).cast("bigint").alias("n_prose"),
        F.size(media).cast("bigint").alias("n_media"),
        chars(of_kind("cell")).alias("cell_chars"),
        chars(of_kind("prose")).alias("prose_chars"),
        contiguous.cast("int").alias("order_contiguous"),
        F.coalesce(media_ok, F.lit(True)).cast("int").alias("media_refs_ok"),
    )


def write_training_shards(documents: DataFrame, path: str,
                          n_shards: int = 64,
                          mode: str = "overwrite",
                          epoch: int = 0) -> None:
    """Materialize the deterministic training shuffle
    (``tdp.sampling.shuffle_shards``): one directory per shard, rows
    inside each shard's files in (order_key, doc_id) order — the
    layout a sequential trainer streams shard-by-shard for a
    reproducible, ingest-order-decorrelated epoch. The doc_id
    tiebreaker keeps the output deterministic even when order_key
    collides (ids beyond one 2^32 window, or an un-deduped input).
    ``epoch`` re-salts shard AND order (an independent deterministic
    shuffle per training epoch — write each epoch to its own path).

    Scale shape: ONE hash-partition exchange on the shard id (the
    unavoidable data movement of a global shuffle), then an in-task
    sort per shard — never a global sort, never a corpus-cardinality
    window. Deterministic end to end: shard and order_key are pure
    functions of doc_id, the exchange is hash-by-shard, and the
    per-partition sort fixes row order regardless of the input's
    partitioning — byte-identical output for any cluster layout."""
    from .tdp.sampling import _epoch_mults, order_key_expr, shard_expr

    m1, m2 = _epoch_mults(epoch)
    keyed = documents.withColumns({
        "shard": shard_expr(n_shards, mult=m1),
        "order_key": order_key_expr(mult=m2),
    })
    (
        keyed.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "order_key", "doc_id")
        .write.mode(mode).partitionBy("shard").parquet(path)
    )
