"""Guard: every bench.py headline name resolves against the union of the
driver window (queries()) and the extra registry (extra_queries()).

The driver window rotates as new operators are promoted (an op promoted
into the 50-slot window evicts another into the extra registry); bench.py
resolves against the union, and this test pins that invariant so a
rotation can never crash BENCH_r{N} again (r5 saw exactly that KeyError
when rel_grouped_collect/knn_cosine ceded their slots to ann_pq/web_scc).
"""

import bench
import __spark_entry__ as entry_mod


def test_headline_names_resolve():
    union = {**entry_mod.extra_queries(), **entry_mod.queries()}
    missing = [n for n in bench.HEADLINE_NAMES if n not in union]
    assert not missing, f"headline names not in any registry: {missing}"


def test_extra_lambda_names_resolve():
    # names bench.py wires explicitly outside HEADLINE_NAMES
    union = {**entry_mod.extra_queries(), **entry_mod.queries()}
    for n in ("quality_nb", "span_dedup", "inverted_index"):
        assert n in union, n
