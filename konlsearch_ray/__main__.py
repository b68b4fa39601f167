"""CLI entry points: ``python -m konlsearch_ray <command>``.

Owns the Ray session (the library itself never calls ``ray.init`` —
driver contract). Commands mirror the reference's embedded API surface:

  build    <source_parquet> <index_dir>   build or resume an index
  append   <source_parquet> <index_dir>   incremental ingest (statuses printed)
  search   <index_dir> <mode> <tok> [...] AND | OR | PHRASE | BM25
  suggest  <index_dir> <prefix>           jamo-prefix suggestions
  tokens   <index_dir> <doc_id>           token set of one document (J3)
  delete   <index_dir> <doc_id> [...]     tombstone docs
  compact  <index_dir>                    rewrite segments without tombstones
  stats    <index_dir>                    print stats.json
  export   <index_dir> <out_dir>          postings -> (term, doc_id, tf) parquet
  snippet  <index_dir> <term>             first-occurrence highlight windows
  mlt      <index_dir> <doc_id>           more-like-this similar docs
  spell    <index_dir> <term>             did-you-mean (edit-distance-1)
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    """Join the cluster when one is addressed (``ray job submit`` sets
    RAY_ADDRESS to the head node), else start a local session."""
    import os

    import ray

    if ray.is_initialized():
        return
    addr = os.environ.get("RAY_ADDRESS")
    if addr and addr != "local":
        ray.init()  # cluster job: connect to the submitted-to cluster
        return
    kwargs = {"address": "local", "include_dashboard": False,
              "logging_level": "ERROR"}
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    ray.init(**kwargs)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="konlsearch_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("source"); b.add_argument("index_dir")
    b.add_argument("--content-col", default="content")
    b.add_argument("--id-col", default=None)
    b.add_argument("--shard-size", type=int, default=32768)
    b.add_argument("--no-dedup", action="store_true")
    b.add_argument("--morph", action="store_true",
                   help="tokenize through the bundled-lexicon morpheme analyzer")

    a = sub.add_parser("append")
    a.add_argument("source"); a.add_argument("index_dir")

    s = sub.add_parser("search")
    s.add_argument("index_dir"); s.add_argument("mode")
    s.add_argument("tokens", nargs="+")
    s.add_argument("-k", type=int, default=10)

    g = sub.add_parser("suggest")
    g.add_argument("index_dir"); g.add_argument("prefix")

    tk = sub.add_parser("tokens")
    tk.add_argument("index_dir"); tk.add_argument("doc_id", type=int)
    tk.add_argument("--ordered", action="store_true",
                    help="print the ordered kept stream instead of the set")

    d = sub.add_parser("delete")
    d.add_argument("index_dir"); d.add_argument("doc_ids", nargs="+", type=int)

    c = sub.add_parser("compact")
    c.add_argument("index_dir")

    st = sub.add_parser("stats")
    st.add_argument("index_dir")

    ex = sub.add_parser("export")
    ex.add_argument("index_dir"); ex.add_argument("out_dir")
    ex.add_argument("--start", default=None,
                    help="inclusive term-range lower bound (parquet pushdown)")
    ex.add_argument("--stop", default=None,
                    help="exclusive term-range upper bound")
    ex.add_argument("--positions", action="store_true",
                    help="include the stored first_pos column")

    sn = sub.add_parser("snippet")
    sn.add_argument("index_dir"); sn.add_argument("term")
    sn.add_argument("--width", type=int, default=2)

    ml = sub.add_parser("mlt")
    ml.add_argument("index_dir"); ml.add_argument("doc_id", type=int)
    ml.add_argument("--terms", type=int, default=5)
    ml.add_argument("-k", type=int, default=10)

    sp = sub.add_parser("spell")
    sp.add_argument("index_dir"); sp.add_argument("term")
    sp.add_argument("-k", type=int, default=5)

    args = p.parse_args(argv)

    if args.cmd == "build":
        _init_ray(args.num_cpus)
        from konlsearch_ray.build import IndexConfig, build_index

        cfg = IndexConfig(content_col=args.content_col, id_col=args.id_col,
                          shard_size=args.shard_size,
                          dedup=not args.no_dedup)
        if args.id_col:
            cfg.sort_keys = []
        if args.morph:
            from konlsearch_ray.analyzer import KoreanLexiconAnalyzer

            cfg.analyzer_factory = KoreanLexiconAnalyzer
        stats = build_index(args.source, args.index_dir, cfg)
        print(json.dumps(stats, default=str))
    elif args.cmd == "append":
        _init_ray(args.num_cpus)
        from konlsearch_ray.build import append_documents

        stats = append_documents(args.index_dir, args.source)
        statuses = stats.pop("statuses")
        print(json.dumps(stats, default=str))
        for row in statuses.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "search":
        from konlsearch_ray.query import IndexReader

        r = IndexReader(args.index_dir)
        if args.mode.upper() == "BM25":
            for doc, score in r.bm25_topk(args.tokens, args.k):
                print(f"{doc}\t{score:.4f}")
        else:
            for doc in r.search(args.tokens, args.mode.upper()):
                print(doc)
    elif args.cmd == "tokens":
        from konlsearch_ray.docstore import DocStore

        store = DocStore(args.index_dir)
        toks = (store.get_ordered_tokens(args.doc_id) if args.ordered
                else store.get_tokens(args.doc_id))
        if toks is None:
            print(f"doc {args.doc_id}: NOT_FOUND", file=sys.stderr)
            return 1
        for t in (toks if args.ordered else sorted(toks)):
            print(t)
    elif args.cmd == "suggest":
        from konlsearch_ray.pipelines.suggest import suggest_jamo_indexed

        for term in suggest_jamo_indexed(args.index_dir, args.prefix)["term"].to_pylist():
            print(term)
    elif args.cmd == "delete":
        from konlsearch_ray.tombstone import delete_docs

        print(delete_docs(args.index_dir, args.doc_ids))
    elif args.cmd == "compact":
        _init_ray(args.num_cpus)
        from konlsearch_ray.tombstone import compact_index

        print(json.dumps(compact_index(args.index_dir), default=str))
    elif args.cmd == "stats":
        with open(f"{args.index_dir}/stats.json") as f:
            print(f.read())
    elif args.cmd == "export":
        _init_ray(args.num_cpus)
        from konlsearch_ray.export import export_postings

        ds = export_postings(args.index_dir, term_start=args.start,
                             term_stop=args.stop,
                             include_positions=args.positions)
        ds.write_parquet(args.out_dir)
        print(json.dumps({"out_dir": args.out_dir}))
    elif args.cmd == "snippet":
        _init_ray(args.num_cpus)
        from konlsearch_ray.export import snippet_table

        for row in snippet_table(args.index_dir, args.term,
                                 width=args.width).take_all():
            print(f"{row['doc_id']}\t{row['pos']}\t{row['snippet']}")
    elif args.cmd == "mlt":
        from konlsearch_ray.query import IndexReader

        r = IndexReader(args.index_dir)
        for doc, score in r.more_like_this(args.doc_id, n_terms=args.terms,
                                           k=args.k):
            print(f"{doc}\t{score:.4f}")
    elif args.cmd == "spell":
        from konlsearch_ray.query import IndexReader

        r = IndexReader(args.index_dir)
        for df, t in r.suggest_spelling(args.term, k=args.k):
            print(f"{t}\t{df}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
