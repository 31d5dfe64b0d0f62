"""Source/sink + standardization operator tests (SURVEY §2.1, §2.4)."""

import json
import os

import pyspark.sql.functions as F

from financial_knowledge_graphs_spark.functions import standardize
from financial_knowledge_graphs_spark.sources import readers


def test_csv_scan_and_convert(spark, tmp_warehouse):
    p = os.path.join(tmp_warehouse, "articles.csv")
    with open(p, "w") as f:
        f.write("newsID,transmissionDate,headline,story,isinTags,tickerTags,isEnglish\n")
        f.write('n1,2024-01-02,Head One,"Story one text.",,,true\n')
        f.write('n2,2024-01-03,Head Two,"Story two, with comma.",,XY,false\n')
    df = readers.read_articles_csv(spark, p)
    rows = {r["newsID"]: r for r in df.collect()}
    assert rows["n2"]["story"] == "Story two, with comma."
    assert rows["n2"]["isEnglish"] is False

    docs = readers.articles_to_documents(df)
    d = docs.filter(F.col("doc_id") == "n1").first()
    assert d["spans"][0]["kind"] == "text"
    assert d["spans"][0]["text"] == "Story one text."


def test_extraction_dir_roundtrip(spark, tmp_warehouse):
    outdir = os.path.join(tmp_warehouse, "results")
    os.makedirs(outdir)
    doc = {"entities": [{"id": "C1", "type": "Company", "name": "Apex",
                         "attributes": {"companyName": "Apex Corp", "ticker": None,
                                        "industry": None, "country": None}}],
           "relationships": []}
    with open(os.path.join(outdir, "result_doc_1.json"), "w") as f:
        json.dump(doc, f)
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump({"entities": [], "relationships": []}, f)
    df = readers.read_extraction_dir(spark, outdir)
    rows = df.collect()
    assert len(rows) == 1  # summary.json excluded (reference file_utils.py:158)
    assert rows[0]["doc_id"] == "doc_1"
    assert rows[0]["entities"][0]["name"] == "Apex"


def test_batch_request_build_and_result_pluck(spark, tmp_warehouse):
    docs = spark.createDataFrame([("d1", "Some story.")], "doc_id string, story string")
    req = readers.build_batch_requests(docs, "Extract from: ").collect()[0]["value"]
    obj = json.loads(req)
    assert obj["custom_id"] == "d1"
    assert obj["body"]["messages"][0]["content"] == "Extract from: Some story."

    p = os.path.join(tmp_warehouse, "results.jsonl")
    line = {"custom_id": "d1", "response": {"body": {"choices": [
        {"message": {"content": "```json\n{\"entities\": [], \"relationships\": []}\n```"}}]}}}
    bad = {"custom_id": "d2", "response": {"body": {"choices": []}}}
    with open(p, "w") as f:
        f.write(json.dumps(line) + "\n" + json.dumps(bad) + "\n")
    out = readers.read_batch_results_jsonl(spark, p)
    rows = {r["doc_id"]: r["content"] for r in out.collect()}
    assert "entities" in rows["d1"]
    assert rows["d2"] == ""  # missing-field guard


def test_tolerant_extraction_fences(spark):
    df = spark.createDataFrame(
        [
            ("fenced", '```json\n{"entities": [], "relationships": []}\n```'),
            ("plain", '{"entities": [], "relationships": []}'),
            ("garbage", "I could not parse the article, sorry!"),
        ],
        "doc_id string, content string",
    )
    out = df.select("doc_id", readers.tolerant_extraction_expr("content").alias("x"))
    rows = {r["doc_id"]: r["x"] for r in out.collect()}
    for k in rows:
        assert list(rows[k]["entities"]) == []
        assert list(rows[k]["relationships"]) == []


def test_standardize_money_percent_date(spark):
    df = spark.createDataFrame(
        [
            ("$1.2 billion", "25.5%", "2024-03-15"),
            ("€250,000", "7 percent", "2024-03"),
            ("3.5m", "12", "3/15/2024"),
            ("no numbers here", "", "March 5, 2024"),
        ],
        "money string, pct string, date string",
    )
    out = df.select(
        standardize.parse_money_expr("money").alias("m"),
        standardize.parse_percentage_expr("pct").alias("p"),
        standardize.normalize_date_expr("date").alias("d"),
    ).collect()
    assert out[0]["m"] == 1.2e9 and out[0]["p"] == 25.5 and out[0]["d"] == "2024-03-15"
    assert out[1]["m"] == 250000.0 and out[1]["p"] == 7.0 and out[1]["d"] == "2024-03"
    assert out[2]["m"] == 3.5e6 and out[2]["d"] == "2024-03-15"
    assert out[3]["m"] is None and out[3]["d"] == "2024-03-05"


def test_pred_label_and_namespacing(spark):
    df = spark.createDataFrame([("acquired", "doc1", "C1")], "t string, d string, l string")
    r = df.select(
        standardize.pred_label_expr("t").alias("lbl"),
        standardize.namespaced_id_expr("d", "l").alias("nid"),
    ).first()
    assert r["lbl"] == "ACQUIRED" and r["nid"] == "doc1_C1"


def test_yaml_scan(spark, tmp_warehouse):
    import os

    from financial_knowledge_graphs_spark.sources.readers import read_articles_yaml

    p = os.path.join(tmp_warehouse, "articles.yaml")
    with open(p, "w") as f:
        f.write("a1: first story text\na2: second story text\n")
    df = read_articles_yaml(spark, p)
    got = {r["newsID"]: r["story"] for r in df.collect()}
    assert got == {"a1": "first story text", "a2": "second story text"}


def _write_minimal_xlsx(path: str) -> None:
    """Hand-built SpreadsheetML zip: header row + 2 data rows, shared +
    inline strings + a number cell — the shapes the vendored reader handles."""
    import zipfile

    m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = f"""<?xml version="1.0"?>
<worksheet xmlns="{m}"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2" t="inlineStr"><is><t>First story</t></is></c><c r="C2"><v>42</v></c></row>
<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3" t="inlineStr"><is><t>Second story</t></is></c><c r="C3"><v>7</v></c></row>
</sheetData></worksheet>"""
    shared = f"""<?xml version="1.0"?>
<sst xmlns="{m}" count="5" uniqueCount="5">
<si><t>newsID</t></si><si><t>story</t></si><si><t>score</t></si>
<si><t>a1</t></si><si><t>a2</t></si></sst>"""
    workbook = f"""<?xml version="1.0"?>
<workbook xmlns="{m}"><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_excel_scan_vendored_reader(spark, tmp_warehouse):
    """SURVEY §2.1 row 2 ungated (VERDICT missing #6): the stdlib xlsx
    reader round-trips a real sheet without openpyxl."""
    import os

    from financial_knowledge_graphs_spark.sources.readers import read_articles_excel

    p = os.path.join(tmp_warehouse, "articles.xlsx")
    _write_minimal_xlsx(p)
    df = read_articles_excel(spark, p)
    rows = {r["newsID"]: (r["story"], r["score"]) for r in df.collect()}
    assert rows == {"a1": ("First story", "42"), "a2": ("Second story", "7")}


def test_flat_triple_payload_roundtrip(spark):
    """Flat OpenIE/prompt-v1/v2 shape (reference ground_truth.py:57-69)
    lifts into the nested extraction struct (VERDICT missing #4)."""
    from financial_knowledge_graphs_spark.operators import extract
    from financial_knowledge_graphs_spark.sources.readers import flat_to_extraction_expr

    payloads = [
        ("d1", '```json\n[{"subject": "Acme Corp", "relation": "acquired", '
               '"object": "Beta LLC"}, {"subject": "Acme Corp", '
               '"relation": "mergedWith", "object": "Gamma Inc"}]\n```'),
        ("d2", '[{"subject": "Solo Co", "relation": "hasDebtHolder", "object": "Solo Co"}]'),
        ("d3", "not json at all"),
    ]
    df = spark.createDataFrame(payloads, "doc_id string, content string").withColumn(
        "extraction", flat_to_extraction_expr("content")
    )
    ments = {(r["doc_id"], r["local_id"], r["name"])
             for r in extract.mentions_df(df).collect()}
    assert ("d1", "E1", "Acme Corp") in ments
    assert ("d1", "E2", "Beta LLC") in ments
    assert ("d1", "E3", "Gamma Inc") in ments
    assert ("d2", "E1", "Solo Co") in ments
    assert not any(d == "d3" for d, _, _ in ments)  # degrade, don't crash
    trips = {(r["doc_id"], r["pred"], r["src_local"], r["tgt_local"])
             for r in extract.raw_triples_df(df).collect()}
    assert ("d1", "acquired", "E1", "E2") in trips
    assert ("d1", "mergedWith", "E1", "E3") in trips
    assert ("d2", "hasDebtHolder", "E1", "E1") in trips


def test_run_registry(spark, tmp_warehouse):
    """SURVEY §2.3 rows 20-21 (VERDICT missing #3): next-version counter +
    latest-version pick, and the pipeline's continue-latest default."""
    from financial_knowledge_graphs_spark.ops import OpsStore

    ops = OpsStore(spark, tmp_warehouse)
    assert ops.latest_run_id() is None
    assert ops.next_run_id() == "run_1"
    assert ops.next_run_id() == "run_2"
    assert ops.latest_run_id() == "run_2"


def test_documents_articles_roundtrip(spark):
    """articles → documents → articles is exact for text-only rows."""
    from financial_knowledge_graphs_spark.sources.readers import (
        articles_to_documents, documents_to_articles,
    )

    rows = [("a1", "2024-01-02", "Headline one", "Story text one.", "", "", True),
            ("a2", "2024-02-03", "Headline two", "Story text two.", "i", "t", False)]
    arts = spark.createDataFrame(
        rows, "newsID string, transmissionDate string, headline string, "
              "story string, isinTags string, tickerTags string, isEnglish boolean")
    back = documents_to_articles(articles_to_documents(arts))
    assert sorted(back.collect()) == sorted(arts.collect())


def test_neo4j_admin_export(spark, tmp_warehouse, small_corpus):
    """Bulk-import CSV export: neo4j-admin headers, referentially intact."""
    import os

    from financial_knowledge_graphs_spark import fixtures as fx
    from financial_knowledge_graphs_spark.pipeline import PipelineConfig, run_pipeline
    from financial_knowledge_graphs_spark.sources.export import export_neo4j_admin_csv

    docs = fx.documents_df(small_corpus)
    alias = fx.alias_dict_df(spark, 20, 42)
    run_pipeline(spark, docs, alias, PipelineConfig(warehouse=tmp_warehouse))
    out = os.path.join(tmp_warehouse, "neo4j_export")
    counts = export_neo4j_admin_csv(spark, tmp_warehouse, out)
    assert counts["nodes"] > 0 and counts["relationships"] > 0

    nodes = spark.read.option("header", True).csv(os.path.join(out, "nodes"))
    rels = spark.read.option("header", True).csv(os.path.join(out, "relationships"))
    assert "entity_id:ID" in nodes.columns and ":LABEL" in nodes.columns
    assert {":START_ID", ":END_ID", ":TYPE"} <= set(rels.columns)
    assert nodes.count() == counts["nodes"]
    assert rels.count() == counts["relationships"]
    # referential integrity: every endpoint resolves to an exported node
    ids = nodes.select(F.col("entity_id:ID").alias("id"))
    dangling = (
        rels.select(F.col(":START_ID").alias("id")).union(
            rels.select(F.col(":END_ID").alias("id")))
        .join(ids, "id", "left_anti").count()
    )
    assert dangling == 0


def test_flat_triples_drop_dangling_endpoints(spark):
    """Review r2-8: triples with empty/null endpoints are dropped, never
    emitted as dangling E0/null references."""
    from financial_knowledge_graphs_spark.sources.readers import flat_to_extraction_expr

    df = spark.createDataFrame(
        [("d", '[{"subject": "", "relation": "owns", "object": "Acme"},'
               ' {"subject": "Beta", "relation": "owns", "object": null},'
               ' {"subject": "Beta", "relation": "owns", "object": "Acme"}]')],
        "doc_id string, content string",
    ).withColumn("x", flat_to_extraction_expr("content"))
    row = df.first()["x"]
    assert [e["name"] for e in row["entities"]] == ["Beta", "Acme"]
    assert len(row["relationships"]) == 1
    assert row["relationships"][0]["source"] == "E1"
    assert row["relationships"][0]["target"] == "E2"


def test_ops_compaction_and_crash_recovery(spark, tmp_warehouse):
    """Ops-plane small-file hygiene: thousands of micro-batch appends fold
    to one file past the threshold, rows byte-identical; the two-rename
    swap recovers from a crash at either window (rewrite complete →
    install it; incomplete → roll back the original)."""
    import os
    import shutil

    from financial_knowledge_graphs_spark.ops import OpsStore

    ops = OpsStore(spark, os.path.join(tmp_warehouse, "ops_compact"))
    for i in range(10):
        ops.log_metrics("run_1", "s", {"m": float(i)})
    before = sorted(map(tuple, ops.read("metrics").collect()))
    n0 = ops._n_files(ops.metrics_path)
    assert n0 >= 10

    done = ops.compact(max_files=5)
    assert done.get("metrics") == n0
    assert ops._n_files(ops.metrics_path) == 1
    assert sorted(map(tuple, ops.read("metrics").collect())) == before
    assert ops.compact(max_files=5) == {}  # below threshold: no-op

    # crash between the swap renames, rewrite COMPLETE (_SUCCESS present)
    shutil.copytree(ops.metrics_path, ops.metrics_path + "__compact")
    os.rename(ops.metrics_path, ops.metrics_path + "__retired")
    assert sorted(map(tuple, ops.read("metrics").collect())) == before
    assert not os.path.exists(ops.metrics_path + "__retired")

    # crash mid-rewrite (no _SUCCESS): original rolls back
    os.rename(ops.metrics_path, ops.metrics_path + "__retired")
    os.makedirs(ops.metrics_path + "__compact")
    assert sorted(map(tuple, ops.read("metrics").collect())) == before
    assert os.path.isdir(ops.metrics_path)

    # crash mid-swap followed by an APPEND (not a read) first: the append
    # must recover the parked history before writing — without that, a
    # later _recover would see the recreated live dir and rmtree __retired,
    # silently destroying the table's whole history
    os.rename(ops.metrics_path, ops.metrics_path + "__retired")
    ops.log_metrics("run_2", "s", {"m": 99.0})
    got = sorted(map(tuple, ops.read("metrics").collect()))
    assert len(got) == len(before) + 1
    assert ("run_2", "s", "m", 99.0) in set(got)
