"""Source parsers: the reference's pluggy parser registry re-expressed as
named DataFrame-producing functions (same lookup semantics as get_parser,
/root/reference/src/dug/core/parsers/__init__.py:63-75, including
error-on-unknown)."""

from __future__ import annotations

from .json_parser import parse_radx_json  # noqa: F401
from .warc_parser import (  # noqa: F401
    parse_warc_column,
    read_warc,
    warc_to_corpus,
)
from .tsv_parser import parse_topmed_csv, parse_topmed_tags  # noqa: F401
from .xml_parser import (  # noqa: F401
    BRAND_TYPES,
    VARIANTS,
    parse_data_dict_xml,
    parse_variant_xml,
)

_PARSERS = {
    "topmedtag": parse_topmed_tags,
    "topmedcsv": parse_topmed_csv,
    "radx": parse_radx_json,
    # beyond the reference registry: the Common-Crawl container format for
    # the BASELINE web-corpus input shape
    "warc": read_warc,
}
# variant XML parsers (S7-S11): nida, scicrunch, sprint, bacpac, ctn, healdp
for _vname in VARIANTS:
    _PARSERS[_vname] = (
        lambda spark, path, v=_vname: parse_variant_xml(spark, path, v)
    )
# the 16 dbGaP-branded parsers (dbgap_parser.py:87-161; registry
# parsers/__init__.py:26-52) differ only in the `type` literal
for _brand_key, _brand in BRAND_TYPES.items():
    _PARSERS[_brand_key] = (
        lambda spark, path, brand=_brand: parse_data_dict_xml(spark, path, data_type=brand)
    )


class UnknownParserError(Exception):
    pass


def get_parser(name: str):
    """Error-on-unknown lookup (parsers/__init__.py:63-75)."""
    try:
        return _PARSERS[name.lower()]
    except KeyError:
        raise UnknownParserError(f"Cannot find parser of type '{name}'") from None
