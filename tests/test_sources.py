"""Source parser tests against generated fixture files (mirrors the
reference's parser integration tests, tests/integration/test_parsers.py)."""

import json

import pytest

from dug_spark.sources import (
    UnknownParserError,
    get_parser,
    parse_data_dict_xml,
    parse_radx_json,
    parse_topmed_csv,
    parse_topmed_tags,
)
from dug_spark.sources.tsv_parser import DanglingTagError

XML = """<?xml version="1.0" encoding="ISO-8859-5"?>
<data_table id="pht000001.v1" study_id="phs000001.v1" participant_set="2">
  <variable id="phv00000001.v1">
    <name>AGE</name>
    <description>Age of Participant</description>
  </variable>
  <variable id="phv00000002.v1">
    <name>SEX</name>
    <description>Sex of Participant</description>
  </variable>
  <variable id="phv00000003.v1">
    <name>BMI</name>
    <description>Body Mass Index</description>
  </variable>
</data_table>
"""

TSV_HEADER = (
    "tag_pk\ttag_title\tvariable_phv\tvariable_name\tvariable_desc\t"
    "variable_full_accession\tdataset_full_accession\tstudy_full_accession\t"
    "study_name\tstudy_phs\tstudy_version\tcreated\tmodified"
)


def _tsv_row(pk, phv, name, desc):
    return (
        f"{pk}\tTag{pk}\tphv{phv:08d}\t{name}\t{desc}\t"
        f"phv{phv:08d}.v1.p1\tpht000001.v1.p1\tphs000001.v1.p1\t"
        f"Test Study\tphs000001\tv1\t2019-01-01\t2019-01-02"
    )


@pytest.fixture
def xml_dir(tmp_path):
    d = tmp_path / "xml"
    d.mkdir()
    (d / "phs000001.v1.pht000001.v1.test_study.data_dict.xml").write_text(XML)
    (d / "GapExchange_phs000001.xml").write_text("<GapExchange/>")
    return str(d)


def test_dbgap_xml_parser(spark, xml_dir):
    df = parse_data_dict_xml(spark, xml_dir)
    rows = {r["element_id"]: r for r in df.collect()}
    # GapExchange file skipped (F2); 3 variables parsed
    assert len(rows) == 3
    r = rows["phv00000001.v1.p2"]
    assert r["element_name"] == "AGE"
    assert r["element_desc"] == "age of participant"  # lowered at parse
    assert r["collection_id"] == "phs000001.v1.p2"
    assert r["collection_name"] == "test_study"
    assert r["data_type"] == "dbGaP"
    assert "variable.cgi?study_id=phs000001.v1.p2&phv=00000001" in r["element_action"]
    assert "study.cgi?study_id=phs000001.v1.p2" in r["collection_action"]


def test_branded_parsers_change_type_only(spark, xml_dir):
    anvil = get_parser("anvil")(spark, xml_dir)
    assert {r["data_type"] for r in anvil.collect()} == {"AnVIL"}
    with pytest.raises(UnknownParserError):
        get_parser("nope")


def test_topmed_csv_parser(spark, tmp_path):
    p = tmp_path / "vars.tsv"
    p.write_text(
        "\n".join(
            [TSV_HEADER, _tsv_row(1, 1, "HEIGHT", "Standing Height"),
             _tsv_row(1, 2, "WEIGHT", "Body Weight")]
        )
    )
    df = parse_topmed_csv(spark, str(p))
    rows = {r["element_id"]: r for r in df.collect()}
    assert len(rows) == 2
    r = rows["phv00000001.v1.p1"]
    assert r["element_desc"] == "standing height"
    assert r["data_type"] == "TOPMed"
    assert "phv=00000001" in r["element_action"]


def test_topmed_tags_join(spark, tmp_path):
    vp = tmp_path / "vars.tsv"
    vp.write_text(
        "\n".join(
            [TSV_HEADER, _tsv_row(7, 1, "HEIGHT", "Standing Height"),
             _tsv_row(8, 2, "WEIGHT", "Body Weight")]
        )
    )
    tp = tmp_path / "tags.json"
    tp.write_text(
        json.dumps(
            [
                {"pk": 7, "fields": {"title": "Anthropometrics",
                                     "description": "body size measures",
                                     "instructions": "measure standing"}},
                {"pk": 8, "fields": {"title": "Weight", "description": "mass",
                                     "instructions": "use scale"}},
            ]
        )
    )
    elements, concepts = parse_topmed_tags(spark, str(vp), str(tp))
    e = {r["element_id"]: r for r in elements.collect()}
    c = {r["concept_id"]: r for r in concepts.collect()}
    assert len(e) == 2 and len(c) == 2
    assert e["phv00000001.v1.p1"]["metadata"]["tag_concept"] == "TOPMED.TAG:7"
    assert c["TOPMED.TAG:7"]["name"] == "Anthropometrics"
    assert c["TOPMED.TAG:7"]["search_terms"] == ["body size measures"]
    assert c["TOPMED.TAG:7"]["optional_terms"] == ["measure standing"]


def test_topmed_dangling_tag_raises(spark, tmp_path):
    vp = tmp_path / "vars.tsv"
    vp.write_text("\n".join([TSV_HEADER, _tsv_row(99, 1, "X", "x")]))
    tp = tmp_path / "tags.json"
    tp.write_text(json.dumps([{"pk": 7, "fields": {"title": "t", "description": "d",
                                                   "instructions": "i"}}]))
    with pytest.raises(DanglingTagError):
        parse_topmed_tags(spark, str(vp), str(tp))


def test_radx_json_parser(spark, tmp_path):
    p = tmp_path / "radx.json"
    p.write_text(
        json.dumps(
            {
                "records": [
                    {
                        "id": "cde1",
                        "name": "Cough",
                        "description": "Presence of Cough",
                        "metadata": {"datatype": "bool", "cardinality": "1",
                                     "section": "symptoms"},
                        "studies": [
                            {"id": "s1", "name": "Study One", "description": "d1"},
                            {"id": "s2", "name": "Study Two", "description": "d2"},
                        ],
                        "terms": [
                            {"id": "HP:0012735", "label": "Cough", "type": "phenotype",
                             "description": "", "synonyms": ["tussis"]}
                        ],
                    }
                ]
            }
        )
    )
    elements, concepts = parse_radx_json(spark, str(p))
    e = elements.collect()
    # records × studies cross-product: 1 record × 2 studies = 2 elements
    assert len(e) == 2
    assert {r["collection_id"] for r in e} == {"s1", "s2"}
    assert e[0]["element_desc"] == "presence of cough"
    assert e[0]["metadata"]["datatype"] == "bool"
    c = concepts.collect()
    assert len(c) == 1
    assert c[0]["concept_id"] == "HP:0012735"
    assert c[0]["search_terms"] == ["tussis"]


VARIANT_XML = """<data_table id="t1" study_id="{sid}" study_name="{sname}" participant_set="3">
  <variable id="VAR1">
    <name>COUGH</name>
    <description>Presence of Cough</description>
  </variable>
  <variable id="VAR2">
    <name>EMPTY</name>
    <description></description>
  </variable>
  <variable id="VAR3"/>
</data_table>
"""


def _write_variant(tmp_path, fname, sid="NIDA-CTN-0001", sname="Study X"):
    d = tmp_path / "vx"
    d.mkdir(exist_ok=True)
    p = d / fname
    p.write_text(VARIANT_XML.format(sid=sid, sname=sname))
    return str(d)


def test_nida_parser(spark, tmp_path):
    from dug_spark.sources import parse_variant_xml

    d = _write_variant(tmp_path, "NIDA-CTN-0001-Dictionary.xml")
    rows = {r["element_id"]: r for r in parse_variant_xml(spark, d, "nida").collect()}
    r = rows["VAR1.p3"]
    assert r["data_type"] == "NIDA"
    assert r["collection_name"] == "NIDA-CTN-0001"  # stem minus -Dictionary
    assert r["collection_action"] == "https://datashare.nida.nih.gov/study/NIDA-CTN-0001"
    assert r["element_desc"] == "presence of cough"


def test_ctn_parser_skips_empty_variables(spark, tmp_path):
    from dug_spark.sources import parse_variant_xml

    d = _write_variant(tmp_path, "ctn.xml", sid="CTN:0094", sname="CTN Study")
    rows = parse_variant_xml(spark, d, "ctn").collect()
    ids = {r["element_id"] for r in rows}
    # F13: the self-closed <variable/> (no text) is skipped
    assert "VAR3" not in ids
    assert ids == {"VAR1", "VAR2"}
    r = [x for x in rows if x["element_id"] == "VAR1"][0]
    assert r["collection_action"] == "https://ctnlibrary.org/protocol/0094"
    assert r["collection_name"] == "CTN Study"


def test_sprint_bacpac_healdp_scicrunch(spark, tmp_path):
    from dug_spark.sources import parse_variant_xml

    d = _write_variant(tmp_path, "FORM7.xml", sid="HEALPLATFORM:HDP123", sname="Heal Study")
    sprint = parse_variant_xml(spark, d, "sprint").collect()
    assert {r["data_type"] for r in sprint} == {"SPRINT"}
    assert sprint[0]["collection_name"] == "FORM7"

    bac = parse_variant_xml(spark, d, "bacpac").collect()
    assert bac[0]["collection_id"] == "HEALPLATFORM:HDP00692"
    assert bac[0]["element_action"].endswith("HDP00692")

    heal = parse_variant_xml(spark, d, "healdp").collect()
    assert heal[0]["collection_action"] == "https://healdata.org/portal/discovery/HDP123"

    # the DOI link builder itself (scicrunch_parser.py:33-49) — pure
    # function test: Hadoop path listing can't read filenames containing
    # ':' so the Spark read below uses a colon-free name
    from dug_spark.sources.xml_parser import _scicrunch_link

    assert (
        _scicrunch_link("/x/DOI:10.26275-howg-tbhj.xml")
        == "https://DOI.org/10.26275/howg-tbhj"
    )
    d2 = _write_variant(tmp_path, "scifile.xml", sid="S1", sname="Sci Study")
    sci = {r["element_id"]: r for r in parse_variant_xml(spark, d2, "scicrunch").collect()}
    r = sci["VAR1.p3"]
    assert r["data_type"] == "SPARC"
    assert r["collection_id"] == "S1.p3"
