"""dbGaP-style data-dictionary XML → elements DataFrame.

Reference: /root/reference/src/dug/core/parsers/dbgap_parser.py:44-84 —
per file: skip GapExchange files (:46-49), parse with iso-8859-5 decoding
(:50), take study_id + participant_set from the root attrs (:52-53), study
name from the filename regex (:17-23; the reference first tries the
adjacent GapExchange sibling file, :26-38 — a local-scandir pattern that
doesn't survive object stores, so here the filename rule is authoritative
and a missing name still raises),
one element per <variable> with element_id '{id}.p{participant_set}',
lower-cased description (:69), dbGaP study/variable action links
(utils.py:30-38).  The 15 branded subclasses (:87-161) only change the
`type` literal → a config map here.

Spark-native: files are read as a binaryFile scan (path, content) and
parsed inside mapInPandas — one Arrow batch of files per task, no driver
loop, so a million data dictionaries parse as one narrow stage.
"""

from __future__ import annotations

import re
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas

BRAND_TYPES = {
    "dbgap": "dbGaP",
    "anvil": "AnVIL",
    "crdc": "CRDC",
    "kfdrc": "KFDRC",
    "biolincc": "BioLINCC",
    "covid19": "COVID19",
    "dir": "DIR",
    "lungmap": "LungMAP",
    "nsrr": "NSRR",
    "parent": "Parent",
    "pcgc": "PCGC",
    "recover": "RECOVER",
    "topmeddbgap": "TOPMed",
    "curesc": "CureSC",
    "heartfailure": "HeartFailure",
    "imaging": "Imaging",
    "reds": "REDS",
}

_STUDY_NAME_RE = re.compile(
    r".*/*phs[0-9]+\.v[0-9]+\.pht[0-9]+\.v[0-9]+\.(.+)\.data_dict.*"
)

_DBGAP_STUDY_URL = "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/study.cgi"
_DBGAP_VAR_URL = "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/variable.cgi"


def study_name_from_filename(path: str) -> str | None:
    m = _STUDY_NAME_RE.match(path)
    return m.group(1) if m else None


def _parse_one(path: str, content: bytes, data_type: str) -> list[dict]:
    root = ET.fromstring(content.decode("iso-8859-5"))
    study_id = root.attrib["study_id"]
    participant_set = root.get("participant_set", "0")
    study_name = study_name_from_filename(path)
    if study_name is None:
        raise IOError(f"Unable to parse DbGaP study name from data dictionary: {path}!")
    coll_id = f"{study_id}.p{participant_set}"
    rows = []
    for var in root.iter("variable"):
        elem_id = f"{var.attrib['id']}.p{participant_set}"
        name_el, desc_el = var.find("name"), var.find("description")
        desc = (desc_el.text or "") if desc_el is not None else ""
        action = ""
        if "phv" in elem_id:
            phv = elem_id.split(".")[0].split("phv")[1]
            action = f"{_DBGAP_VAR_URL}?study_id={coll_id}&phv={phv}"
        rows.append(
            {
                "element_id": elem_id,
                "element_name": name_el.text if name_el is not None else "",
                "element_desc": desc.lower(),
                "data_type": data_type,
                "collection_id": coll_id,
                "collection_name": study_name,
                "collection_desc": "",
                "element_action": action,
                "collection_action": f"{_DBGAP_STUDY_URL}?study_id={coll_id}",
                "metadata": {},
            }
        )
    return rows


def parse_data_dict_xml(
    spark: SparkSession, path: str, data_type: str = "dbGaP"
) -> DataFrame:
    """Glob/dir of data-dict XMLs → ELEMENTS DataFrame."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        # F2: GapExchange filename-predicate skip (dbgap_parser.py:46-49)
        .where(~F.element_at(F.split("path", "/"), -1).contains("GapExchange"))
        .select("path", "content")
    )

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schemas.ELEMENTS.fields]
        for pdf in batches:
            rows: list[dict] = []
            for p, c in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_one(p, bytes(c), data_type))
            out = pd.DataFrame(rows, columns=cols)
            yield out.astype({c: "object" for c in cols})

    return files.mapInPandas(parse_batches, schema=schemas.ELEMENTS)


# ---------------------------------------------------------------------------
# Variant XML parsers (S7–S11): same scan engine, per-brand rules for study
# name, id suffixing, links, and null/empty handling.
#   nida      /root/reference/src/dug/core/parsers/nida_parser.py:26-57
#   scicrunch parsers/scicrunch_parser.py:53-82 (DOI filename subs :20-49)
#   sprint    parsers/sprint_parser.py:20-49 (null-safe description)
#   bacpac    parsers/bacpac_parser.py:19-50 (hardcoded study id/link)
#   ctn       parsers/ctn_parser.py:25-62 (skip empty variables, F13)
#   healdp    parsers/heal_dp_parser.py:26-56 (study_name from root attr)


def _nida_stem_name(path: str) -> str | None:
    stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
    if not stem.startswith("NIDA-"):
        return None
    for suffix in ("-Dictionary", "_DD"):
        if stem.endswith(suffix):
            stem = stem[: -len(suffix)]
    return stem


def _scicrunch_link(path: str) -> str | None:
    stem = path.rsplit("/", 1)[-1].rsplit(".xml", 1)[0]
    if not stem.startswith("DOI"):
        return None
    return ("https://" + stem).replace("DOI:", "DOI.org/").replace("-", "/", 1)


VARIANTS: dict[str, dict] = {
    "nida": dict(
        data_type="NIDA", pset_suffix=True,
        study_name=lambda path, root: _nida_stem_name(path),
        collection_action=lambda path, root, sid: f"https://datashare.nida.nih.gov/study/{sid}",
    ),
    "scicrunch": dict(
        data_type="SPARC", pset_suffix=True,
        study_name=lambda path, root: root.get("study_name"),
        collection_action=lambda path, root, sid: _scicrunch_link(path) or "",
    ),
    "sprint": dict(
        data_type="SPRINT", pset_suffix=False,
        study_name=lambda path, root: path.rsplit("/", 1)[-1].rsplit(".", 1)[0],
        collection_action=lambda path, root, sid: "",
    ),
    "bacpac": dict(
        data_type="BACPAC", pset_suffix=False,
        study_id="HEALPLATFORM:HDP00692",
        study_name=lambda path, root: "Back Pain Consortium (BACPAC) Minimum Dataset",
        collection_action=lambda path, root, sid: "https://healdata.org/portal/discovery/HDP00692",
        element_action=lambda: "https://healdata.org/portal/discovery/HDP00692",
    ),
    "ctn": dict(
        data_type="ctn", pset_suffix=False, skip_empty=True,
        study_name=lambda path, root: root.get("study_name"),
        collection_action=lambda path, root, sid: (
            f"https://ctnlibrary.org/protocol/{sid.split(':')[1]}" if ":" in sid else ""
        ),
    ),
    "healdp": dict(
        data_type="heal-dp", pset_suffix=False,
        study_name=lambda path, root: root.get("study_name"),
        collection_action=lambda path, root, sid: (
            f"https://healdata.org/portal/discovery/{sid.split(':')[1]}" if ":" in sid else ""
        ),
    ),
}


def _parse_variant(path: str, content: bytes, variant: dict) -> list[dict]:
    root = ET.fromstring(content)
    study_id = variant.get("study_id") or root.attrib["study_id"]
    pset = root.get("participant_set", "0")
    study_name = variant["study_name"](path, root)
    if study_name is None:
        raise IOError(f"Unable to parse study name from data dictionary: {path}!")
    coll_id = f"{study_id}.p{pset}" if variant.get("pset_suffix") else study_id
    rows = []
    for var in root.iter("variable"):
        if variant.get("skip_empty") and not var.text:
            continue  # F13: CTN skips childless <variable/> (ctn_parser.py:43-44)
        desc_el = var.find("description")
        desc = (desc_el.text or "") if desc_el is not None else ""
        name_el = var.find("name")
        elem_id = var.attrib["id"] + (f".p{pset}" if variant.get("pset_suffix") else "")
        rows.append(
            {
                "element_id": elem_id,
                "element_name": name_el.text if name_el is not None else "",
                "element_desc": desc.lower(),
                "data_type": variant["data_type"],
                "collection_id": coll_id,
                "collection_name": study_name,
                "collection_desc": "",
                "element_action": variant.get("element_action", lambda: "")(),
                "collection_action": variant["collection_action"](path, root, study_id),
                "metadata": {},
            }
        )
    return rows


def parse_variant_xml(spark: SparkSession, path: str, variant_name: str) -> DataFrame:
    variant = VARIANTS[variant_name]

    files = (
        spark.read.format("binaryFile").load(path).select("path", "content")
    )

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schemas.ELEMENTS.fields]
        for pdf in batches:
            rows: list[dict] = []
            for p, c in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_variant(p, bytes(c), variant))
            out = pd.DataFrame(rows, columns=cols)
            yield out.astype({c: "object" for c in cols})

    return files.mapInPandas(parse_batches, schema=schemas.ELEMENTS)
