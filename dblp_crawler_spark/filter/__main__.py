"""Offline filter CLI — `python -m dblp_crawler_spark.filter`.

Mirrors /root/reference/dblp_crawler/filter/__main__.py:10-22:
read a legacy summary JSON (-i), apply filters in order (-f,
repeatable), write the filtered summary (-o).

DIVERGENCE (documented, SURVEY.md §8/F4): the reference `eval()`s
each -f string into a callable (filter/__main__.py:19-20), letting a
CLI argument run arbitrary code. Here -f is declarative:
`name=value`, where name resolves against the transform REGISTRY:

  drop_old_person_publications=YEAR   (filter/__init__.py:4-9)
  drop_old_cooperation=YEAR           (filter/__init__.py:12-17)
  drop_nodes_by_all_publications=N    (filter/__init__.py:20-25,
                                       drops dangling edges too)
  drop_edges_by_all_publications=N    (filter/__init__.py:28-33)

plus any transform a `--filter-module` plugin registered with
`register_filter` — the generic map_node/map_person_publications/
map_cooperation extension point (reference filter/utils.py:13-77)
via module import, never by eval'ing the argument string.
"""

from __future__ import annotations

import argparse
import json
import logging

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("dblp_crawler_spark.filter")


def apply_filter(spec: str, sn, se, sp):
    """Resolve `name=value` against the transform registry (built-ins
    plus anything a --filter-module registered) and apply it."""
    from . import resolve_filter

    name, _, raw = spec.partition("=")
    try:
        fn = resolve_filter(name)
    except KeyError as exc:
        raise SystemExit(str(exc)) from exc
    try:
        return fn(sn, se, sp, raw)
    except ValueError as exc:
        raise SystemExit(f"bad filter spec {spec!r}: {exc}") from exc


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="dblp_crawler_spark.filter")
    parser.add_argument("-i", "--input", type=str, required=True, help="Input file path.")
    parser.add_argument("-o", "--output", type=str, required=True, help="Output file path.")
    parser.add_argument("-f", "--filter", action="append", required=True,
                        help="Filter spec name=value; repeat to chain in order. "
                             "Names resolve against the transform registry "
                             "(built-ins + --filter-module registrations).")
    parser.add_argument("--filter-module", action="append", default=[],
                        help="Importable module that registers custom summary "
                             "transforms via dblp_crawler_spark.filter."
                             "register_filter — the reference's map_node/"
                             "map_person_publications extension point "
                             "(filter/utils.py:13-77) as a plugin import, "
                             "not an eval'd argument string.")
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)
    import importlib

    for mod in args.filter_module:
        importlib.import_module(mod)

    from ..session import get_spark
    from ..summary_io import read_summary_json, summary_doc_from_frames

    spark = get_spark("dblp-crawler-spark-filter", master=args.master)
    try:
        sn, se, sp = read_summary_json(spark, args.input)
        for spec in args.filter:
            logger.info("Applying: %s", spec)
            sn, se, sp = apply_filter(spec, sn, se, sp)
        doc = summary_doc_from_frames(sn, se, sp)
        with open(args.output, "w", encoding="utf8") as f:
            json.dump(doc, f, indent=2)
        logger.info("Filtered summary written to %s", args.output)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
