"""Job entry point — ``ray job submit -- python -m llama_ray.cli ...``.

Runs one analytics job over an edge source with per-superstep
checkpointing; an interrupted job resumes from the newest complete
manifest with ``--resume`` (the north-rule resumability path; see
``llama_ray.engine.checkpoint``). Works against a cluster address via
the normal ``ray job submit`` machinery (the driver process inherits
the cluster connection; ``ray.init`` here only starts a local session
when none exists).

Examples:
    python -m llama_ray.cli pagerank --input 'rmat(16,8)' \
        --checkpoint-dir /tmp/pr_ckpt --max-iters 10 --output /tmp/pr_out
    python -m llama_ray.cli pagerank --input edges.parquet \
        --checkpoint-dir /tmp/pr_ckpt --resume
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llama_ray")
    p.add_argument(
        "algorithm",
        choices=[
            "pagerank", "wcc", "scc", "kcore", "label_propagation", "sssp",
            "bfs", "tc", "bc", "load", "walks", "sample", "mis", "anf",
            "harmonic", "support", "featprop", "matching", "diameter",
            "closeness", "pack", "contam", "contam_bloom", "repetition", "dedup_docs",
            "gopher", "edit_pairs", "onion", "dsir", "semdedup", "ccnet",
        ],
        help="analytics task, or 'load': build a snapshot level from the input "
        "(the llama-load analogue, /root/reference/tools/llama-load.cc)",
    )
    p.add_argument("--db", default=None, help="snapshot store dir (for 'load', or as input with --from-db)")
    p.add_argument("--from-db", action="store_true", help="read edges from the --db snapshot store")
    p.add_argument("--input", default=None, help="edge source: parquet path, .net/.xs1 file, or rmat(...)/er(...)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-iters", type=int, default=10)
    p.add_argument("--tol", type=float, default=None)
    p.add_argument("--root", type=int, default=None, help="root vertex for bfs/sssp")
    p.add_argument("--engine", choices=["dataset", "bsp", "bsp_sharded"], default="dataset")
    p.add_argument("--weighted", action="store_true")
    p.add_argument("--dedup", action="store_true", help="dedup edges before building")
    p.add_argument("--output", default=None, help="write per-vertex results parquet here")
    p.add_argument("--top-k", type=int, default=0, help="print top-k (pagerank)")
    p.add_argument("--steps", type=int, default=4, help="walk length (walks)")
    p.add_argument("--rounds", type=int, default=2, help="propagation sweeps (featprop)")
    p.add_argument("--fanout", type=int, default=3, help="neighbors per vertex (sample)")
    p.add_argument("--seed", type=int, default=20260818, help="sampling seed (walks/sample/mis/anf)")
    p.add_argument("--docs", default=None, help="documents parquet (pack/contam/repetition/dedup_docs)")
    p.add_argument("--seq-len", type=int, default=2048, help="packed sequence length (pack)")
    p.add_argument("--ngram", type=int, default=None, help="word n-gram width (contam/repetition)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .algos.bc import betweenness_centrality
    from .algos.components import label_propagation, weakly_connected_components
    from .algos.pagerank import pagerank, pagerank_top_k
    from .algos.traversal import bfs, sssp
    from .algos.triangles import triangle_count
    from .graph import build_graph
    from .ingest.canonicalize import dedup_edges
    from .sinks import write_results_parquet
    from .sources.registry import load_edges

    from .snapshots.store import SnapshotStore

    if args.algorithm == "load":
        if not args.db:
            p.error("'load' requires --db")
        store = SnapshotStore(args.db)
        edges = load_edges(args.input)
        if args.dedup:
            edges = dedup_edges(edges)
        import time as _t

        t0 = _t.perf_counter()
        level = store.ingest_batch(edges)
        dt = _t.perf_counter() - t0
        n = store.edges(at_level=level).count()
        print(
            json.dumps(
                {
                    "algorithm": "load",
                    "db": args.db,
                    "level": level,
                    "edges_total": n,
                    "kedges_per_sec": round(n / dt / 1000, 1),
                }
            )
        )
        return 0

    if args.algorithm == "semdedup":
        if not args.docs:
            p.error("'semdedup' requires --docs <embeddings parquet>")
        import ray.data as rd

        from .data_ops.dedup import semantic_dedup

        out = semantic_dedup(rd.read_parquet(args.docs))
        if args.output:
            out.write_parquet(args.output)
            rows = rd.read_parquet(args.output).count()
        else:
            rows = out.count()
        print(json.dumps({"algorithm": "semdedup", "docs": args.docs, "rows": rows}))
        return 0

    if args.algorithm in ("pack", "contam", "contam_bloom", "repetition", "dedup_docs",
                          "gopher", "edit_pairs", "dsir", "ccnet"):
        if not args.docs:
            p.error(f"'{args.algorithm}' requires --docs <parquet>")
        import ray.data as rd

        docs = rd.read_parquet(args.docs)
        if args.algorithm == "pack":
            from .data_ops.packing import pack_sequences

            out = pack_sequences(docs, seq_len=args.seq_len)
        elif args.algorithm == "contam":
            from .data_ops.packing import contamination

            out = contamination(docs, **({"n": args.ngram} if args.ngram else {}))
        elif args.algorithm == "contam_bloom":
            from .data_ops.packing import contamination_bloom

            out = contamination_bloom(docs, **({"n": args.ngram} if args.ngram else {}))
        elif args.algorithm == "repetition":
            from .data_ops.curation import repetition_ratio

            out = repetition_ratio(docs, **({"n": args.ngram} if args.ngram else {}))
        elif args.algorithm == "gopher":
            from .data_ops.curation import gopher_filter

            out = gopher_filter(docs)
        elif args.algorithm == "edit_pairs":
            from .data_ops.text import edit_distance_pairs

            out = edit_distance_pairs(docs)
        elif args.algorithm == "dsir":
            from .data_ops.curation import dsir_weights

            out = dsir_weights(docs)
        elif args.algorithm == "ccnet":
            from .data_ops.relational import grouped_ntile, sort_merge_join
            from .data_ops.text import lm_score

            joined = sort_merge_join(
                lm_score(docs),
                docs.select_columns(["doc_id", "lang"]),
                left_on="doc_id",
            )
            out = grouped_ntile(
                joined.select_columns(["doc_id", "lang", "lm_score"]),
                group_col="lang", order_cols=["lm_score", "doc_id"],
                k=3, out_col="ppl_bucket",
            )
        else:
            from .data_ops.dedup import exact_dedup

            out = exact_dedup(docs)
        if args.output:
            out.write_parquet(args.output)
            rows = rd.read_parquet(args.output).count()
        else:
            rows = out.count()
        print(json.dumps({"algorithm": args.algorithm, "docs": args.docs, "rows": rows}))
        return 0

    if args.from_db:
        if not args.db:
            p.error("--from-db requires --db")
        edges = SnapshotStore(args.db).edges()
    else:
        if not args.input:
            p.error("--input required (or use --from-db with --db)")
        edges = load_edges(args.input)
        if args.dedup:
            edges = dedup_edges(edges)
    g = build_graph(edges)

    summary = {"algorithm": args.algorithm, "vertices": g.num_vertices, "edges": g.num_edges}
    arrays = {}
    if args.algorithm == "pagerank":
        res = pagerank(
            g,
            max_iters=args.max_iters,
            tol=args.tol,
            engine=args.engine,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        arrays["rank"] = res.state["rank"]
        summary.update(
            iterations=res.iterations,
            converged=res.converged,
            sum_rank=float(res.state["rank"].sum()),
            edges_per_sec=res.edges_per_sec,
        )
        if args.top_k:
            summary["top_k"] = pagerank_top_k(g, res, args.top_k)
    elif args.algorithm == "wcc":
        res = weakly_connected_components(
            g, engine=args.engine, checkpoint_dir=args.checkpoint_dir, resume=args.resume
        )
        arrays["component"] = res.state["label"]
        summary.update(iterations=res.iterations, components=int(len(set(res.state["label"]))))
    elif args.algorithm == "scc":
        from .algos.components import strongly_connected_components

        res = strongly_connected_components(g)
        arrays["component"] = res.state["label"]
        summary.update(supersteps=res.iterations, components=int(len(set(res.state["label"]))))
    elif args.algorithm == "kcore":
        from .algos.kcore import core_numbers
        from .graph import canonical_undirected

        cg = canonical_undirected(g)
        res = core_numbers(
            cg, checkpoint_dir=args.checkpoint_dir, resume=args.resume
        )
        import numpy as _np

        # cg.ids ⊆ g.ids (vertices with only self-loops drop out of the
        # canonical set and keep core 0); vectorized id→core map
        core = _np.zeros(len(g.ids), _np.int64)
        if len(cg.ids):  # all-self-loop inputs leave the canonical set empty
            pos = _np.searchsorted(cg.ids, g.ids)
            pos_c = _np.minimum(pos, len(cg.ids) - 1)
            valid = cg.ids[pos_c] == g.ids
            core[valid] = res.state["core"][pos_c[valid]]
        arrays["core"] = core
        summary.update(iterations=res.iterations, max_core=int(res.state["core"].max(initial=0)))
    elif args.algorithm == "onion":
        from .algos.kcore import onion_layers
        from .graph import canonical_undirected

        cg = canonical_undirected(g)
        layer_c, core_c = onion_layers(cg)
        import numpy as _np

        layer = _np.zeros(len(g.ids), _np.int64)
        core = _np.zeros(len(g.ids), _np.int64)
        if len(cg.ids):
            pos = _np.searchsorted(cg.ids, g.ids)
            pos_c = _np.minimum(pos, len(cg.ids) - 1)
            valid = cg.ids[pos_c] == g.ids
            layer[valid] = layer_c[pos_c[valid]]
            core[valid] = core_c[pos_c[valid]]
        arrays["layer"] = layer
        arrays["core"] = core
        summary.update(
            num_layers=int(layer_c.max(initial=0)),
            max_core=int(core_c.max(initial=0)),
        )
    elif args.algorithm == "label_propagation":
        res = label_propagation(
            g,
            iterations=args.max_iters,
            engine="bsp" if args.engine in ("bsp", "bsp_sharded") else "dataset",
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        arrays["label"] = res.state["label"]
        summary.update(iterations=res.iterations)
    elif args.algorithm in ("sssp", "bfs"):
        root = args.root if args.root is not None else int(g.ids[0])
        res = sssp(
            g,
            root,
            weighted=(args.weighted and args.algorithm == "sssp"),
            engine=args.engine,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        arrays["dist"] = res.state["dist"]
        import numpy as np

        summary.update(
            root=root,
            reached=int(np.isfinite(res.state["dist"]).sum()),
            max_dist=float(res.state["dist"][np.isfinite(res.state["dist"])].max()),
        )
    elif args.algorithm == "tc":
        summary["triangles"] = triangle_count(g)
    elif args.algorithm == "bc":
        arrays["bc"] = betweenness_centrality(g, num_sources=16)
    elif args.algorithm == "walks":
        from .algos.walks import random_walks

        tbl = random_walks(g, num_steps=args.steps, seed=args.seed, weighted=args.weighted)
        summary.update(walk_rows=tbl.num_rows, steps=args.steps)
        if args.output:
            import pyarrow.parquet as _pq

            _pq.write_table(tbl, args.output)
            summary["output"] = args.output
    elif args.algorithm == "sample":
        from .algos.walks import sample_neighbors

        tbl = sample_neighbors(g, args.fanout, seed=args.seed)
        summary.update(sampled_edges=tbl.num_rows, fanout=args.fanout)
        if args.output:
            import pyarrow.parquet as _pq

            _pq.write_table(tbl, args.output)
            summary["output"] = args.output
    elif args.algorithm == "mis":
        from .algos.mis import maximal_independent_set

        tbl = maximal_independent_set(g, seed=args.seed)
        arrays["in_mis"] = tbl.column("in_mis").to_numpy()
        summary["mis_size"] = int(arrays["in_mis"].sum())
    elif args.algorithm == "anf":
        from .algos.hyperanf import hyperanf

        res = hyperanf(g, seed=args.seed)
        summary.update(
            rounds=res.rounds,
            effective_diameter=res.effective_diameter,
            neighborhood_function=[round(v, 1) for v in res.neighborhood_function],
        )
    elif args.algorithm == "harmonic":
        from .algos.hyperanf import harmonic_centrality

        tbl = harmonic_centrality(g, seed=args.seed)
        arrays["harmonic"] = tbl.column("harmonic").to_numpy()
        summary["max_harmonic"] = float(arrays["harmonic"].max(initial=0.0))
    elif args.algorithm == "support":
        from .algos.truss import edge_support

        tbl = edge_support(g)
        s = tbl.column("support").to_numpy()
        summary.update(edges_undirected=tbl.num_rows, max_support=int(s.max(initial=0)))
        if args.output:
            import pyarrow.parquet as _pq

            _pq.write_table(tbl, args.output)
            summary["output"] = args.output
    elif args.algorithm == "featprop":
        from .algos.featprop import feature_propagation

        tbl = feature_propagation(g, k=4, rounds=args.rounds, seed=args.seed)
        summary.update(feature_rows=tbl.num_rows)
        if args.output:
            import pyarrow.parquet as _pq

            _pq.write_table(tbl, args.output)
            summary["output"] = args.output
    elif args.algorithm == "matching":
        from .algos.matching import maximal_matching

        tbl = maximal_matching(g, seed=args.seed)
        summary.update(matched_edges=tbl.num_rows)
        if args.output:
            import pyarrow.parquet as _pq

            _pq.write_table(tbl, args.output)
            summary["output"] = args.output
    elif args.algorithm == "diameter":
        from .algos.traversal import pseudo_diameter

        row = pseudo_diameter(g).to_pydict()
        summary.update({k: v[0] for k, v in row.items()} if row["start"] else {})
    elif args.algorithm == "closeness":
        from .algos.traversal import closeness_sampled

        tbl = closeness_sampled(g)
        summary.update(sources=tbl.num_rows)
        summary["closeness"] = [
            dict(zip(tbl.column_names, r)) for r in zip(*[c.to_pylist() for c in tbl.columns])
        ]

    if args.output and arrays:
        write_results_parquet(g, arrays, args.output)
        summary["output"] = args.output
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
