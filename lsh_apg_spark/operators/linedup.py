"""Corpus-wide line/paragraph deduplication — the CCNet/C4-style pass
that removes text units repeated ACROSS documents (navigation chrome,
cookie banners, quoted boilerplate) while keeping each unit's first
occurrence, before document-level near-dup runs.

The reference has no sub-document analogue (its unit is the vector /
whole document); this operator is part of the web-text pipeline the
engine targets. First-occurrence semantics follow CCNet (Wenzek et
al. 2020 §3.1: hash each paragraph, drop non-first repeats).

Scale shape: the winner per line is a groupBy(line_key).agg(min(...))
— partially aggregated map-side, so a boilerplate line occurring 10^9
times ships one partial row per task (a window row_number over the
line key would put the hot key in one partition; the agg form cannot).
Kept lines re-join on the 16-byte line key, and document reassembly is
a doc-keyed groupBy with an in-row sort_array, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(docs: DataFrame, delim: str = "\n", id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Split each document on `delim`, keep only the globally-first
    occurrence of every distinct line (first = min (doc_id, position)),
    and reassemble documents from their surviving lines in original
    order. Documents whose every line was seen earlier disappear — on
    a corpus with exact-duplicate documents this subsumes keep-first
    exact dedup; on multi-line corpora it removes per-line boilerplate.

    Returns (id_col, text, n_kept, n_dropped) with `text` rebuilt from
    the kept lines joined by `delim`.

    `delim` is a LITERAL separator (it is both split on and used to
    rejoin): it is regex-quoted before reaching F.split, so
    metacharacter delimiters like "." or "|" split literally instead
    of silently exploding every character.
    """
    # Java-regex literal quoting (Pattern.quote): wrap in \Q...\E,
    # breaking out of any \E the delimiter itself contains
    qdelim = "\\Q" + delim.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), qdelim, -1))
             .alias("pos", "line"))
        .filter(F.length(F.trim("line")) > 0)
        .withColumn("lkey", F.md5(F.col("line").cast("binary")))
    )
    winners = (
        lines.groupBy("lkey")
        .agg(F.min(F.struct(F.col(id_col).alias("d"),
                            F.col("pos").alias("p"))).alias("w"))
        .select("lkey", F.col("w.d").alias(id_col), F.col("w.p").alias("pos"))
    )
    kept = lines.join(winners, ["lkey", id_col, "pos"], "left_semi")
    # per-doc line counts come from a pure array expression on the
    # source row (no second explode/groupBy pass over the corpus)
    per_doc = docs.select(
        F.col(id_col),
        F.size(F.filter(
            F.split(F.col(text_col), qdelim, -1),
            lambda s: F.length(F.trim(s)) > 0)).alias("_n_lines"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("pos", "line"))).alias("ls"))
        .select(
            id_col,
            F.concat_ws(delim, F.transform("ls", lambda s: s["line"]))
             .alias("text"),
            F.size("ls").alias("n_kept"),
        )
    )
    return (
        rebuilt.join(per_doc, id_col)
        .select(id_col, "text", "n_kept",
                (F.col("_n_lines") - F.col("n_kept")).alias("n_dropped"))
    )


def remove_repeated_lines(docs: DataFrame, delim: str = "\n",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """WITHIN-document repeated-line removal (the RefinedWeb-style
    in-page cleanup; `line_dedup` above is the cross-document pass):
    keep the first occurrence of each distinct non-blank line inside a
    document, drop its later repeats, reassemble in original order.
    Returns (id, text, n_kept, n_dropped).

    Scale shape: a pure per-row JVM array expression — zero shuffles,
    zero Python, embarrassingly parallel at any corpus size. The
    first-occurrence test is array_position(lines, x) == index, O(L^2)
    string compares per doc; web pages are <= a few thousand lines, so
    the quadratic term is nanoseconds-scale per row and stays inside
    whole-stage codegen (a sort- or map-based O(L log L) form would
    leave the codegen path for no measurable gain). Blank /
    whitespace-only lines are dropped outright, matching line_dedup's
    stance. ``delim`` is a literal, quoted the same way as
    line_dedup's."""
    qdelim = "\\Q" + delim.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    # staged columns, not one nested expression: embedding the blank-
    # filter lambda INSIDE the first-occurrence lambda collides the
    # auto-named lambda variables and silently mis-evaluates (observed:
    # size(kept) disagreeing with the joined kept text)
    lined = docs.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), qdelim, -1),
                 lambda s: F.length(F.trim(s)) > 0).alias("_ls"))
    kept = lined.select(
        F.col(id_col), "_ls",
        F.filter("_ls", lambda x, i:
                 F.array_position(F.col("_ls"), x) == i + 1).alias("_ks"))
    return kept.select(
        F.col(id_col),
        F.array_join("_ks", delim).alias("text"),
        F.size("_ks").alias("n_kept"),
        (F.size("_ls") - F.size("_ks")).alias("n_dropped"),
    )
