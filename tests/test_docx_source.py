"""DOCX source: build a real OOXML container with stdlib zipfile and
run it through the distributed scan → sessionize chain."""

from __future__ import annotations

import zipfile

from syllabus_sense_spark.operators.sessionize import group_topics, sessionize_elements
from syllabus_sense_spark.sources.docx import docx_topics, read_docx_elements

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _p(text: str) -> str:
    return f'<w:p><w:r><w:t xml:space="preserve">{text}</w:t></w:r></w:p>'


def _tbl(rows: list[list[str]]) -> str:
    trs = "".join(
        "<w:tr>"
        + "".join(f"<w:tc>{_p(c)}</w:tc>" for c in row)
        + "</w:tr>"
        for row in rows
    )
    return f"<w:tbl>{trs}</w:tbl>"


def make_docx(path: str, body_xml: str) -> None:
    document = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{body_xml}</w:body></w:document>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("word/document.xml", document)


BODY = (
    _p("Preamble to be discarded")
    + _p("Core element - Atoms")
    + _p("Atoms are small.")
    + _p("   ")  # whitespace-only: dropped at scan (A3)
    + _tbl([["H", "He"], ["Li", "Be"]])
    + _p("Core element: Bonds")
    + _p("Bonds hold atoms.")
)


def test_docx_scan_and_sessionize(spark, tmp_path):
    doc_path = str(tmp_path / "syllabus.docx")
    make_docx(doc_path, BODY)

    elements = read_docx_elements(spark, str(tmp_path)).collect()
    # Whitespace-only paragraph dropped; 5 paragraphs + 1 table remain.
    assert [e.element_type for e in elements] == [
        "paragraph", "paragraph", "paragraph", "table", "paragraph", "paragraph",
    ]
    assert elements[3].rows == [["H", "He"], ["Li", "Be"]]

    topics = (
        group_topics(sessionize_elements(docx_topics(spark, str(tmp_path))))
        .orderBy("topic_id")
        .collect()
    )
    assert [t.title for t in topics] == ["Atoms", "Bonds"]
    # Preamble discarded; topic 1 holds its paragraph + table in order.
    assert [e.type for e in topics[0].elements] == ["paragraph", "table"]
    assert topics[1].elements[0].text == "Bonds hold atoms."


def test_docx_python_datasource_matches_mapinpandas(spark, tmp_path):
    """The registered `docx` format (Python DataSource API) returns the
    same elements as the binaryFile+mapInPandas scan, one partition per
    document; corrupt containers contribute zero rows."""
    from syllabus_sense_spark.queries.relational12 import scoped_confs
    from syllabus_sense_spark.sources.docx_datasource import register_docx_source

    make_docx(str(tmp_path / "a.docx"), BODY)
    make_docx(str(tmp_path / "b.docx"), BODY)
    (tmp_path / "broken.docx").write_bytes(b"not a zip")

    register_docx_source(spark)
    # The reader implements pushFilters, which Spark rejects outright
    # unless the pushdown conf is on — scope it like the queries do.
    with scoped_confs(spark, {"spark.sql.python.filterPushdown.enabled": "true"}):
        via_ds = spark.read.format("docx").load(str(tmp_path))
        assert via_ds.rdd.getNumPartitions() == 3  # one per file

        ds_rows = {
            (r.path.split("/")[-1], r.element_idx, r.element_type, r.text)
            for r in via_ds.collect()
        }
    mp_rows = {
        (r.path.split("/")[-1], r.element_idx, r.element_type, r.text)
        for r in read_docx_elements(spark, str(tmp_path)).collect()
    }
    assert ds_rows == mp_rows
    assert not any(name == "broken.docx" for name, *_ in ds_rows)
