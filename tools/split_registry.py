#!/usr/bin/env python3
"""One-shot registry split (round-5 hygiene, r4 verdict item 4b): move the
two giant Seq literals in SparkEntry.scala into per-tier files under
src/main/scala/graft/registry/ (package graft), leaving SparkEntry as the
assembly + gates + shared helpers. Pure code motion — the oracle gate
(dump count + 315/315 value+repr checks) proves behavior neutrality.

Entry blocks are delimited by their uniform start lines (`    "name" ->`),
with directly-attached comment lines moved along; no paren parsing needed.
Helpers referenced across files are widened from `private` to
`private[graft]` (same package; encapsulation preserved at the library
boundary).
"""
import re, os, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT_DIR = "src/main/scala/graft/registry"

TIERS = [
    ("AnnTier", ("ann_",)),
    ("DictTier", ("dict_",)),
    ("WebTier", ("web_",)),
    ("KgTier", ("kg_",)),
    ("TextTier", ("text_",)),
    ("CurateTier", ("curate_",)),
    ("DedupSimTier", ("dedup_", "sim_", "sketch_")),
    ("CoreTier", ()),  # catchall: q_, io_, mm_, stream_, ...
]

IMPORTS = """\
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.annotate.{Corpus, Expand, Filters, Scan, Scoring}
import graft.dict.{AnnotatorModel, AutomatonBuild, DictBuild}
import graft.emit.Triples
import graft.fixture.OntologyFixture
import graft.graph.Closure
import graft.ops.{AsOf, Dedup, LinkGraph, Multimodal, RangeJoin, Sampling, Similarity, Sketch, TextOps, WebOps}
import graft.streaming.EventStream

import graft.SparkEntry._
"""

ENTRY_RE = re.compile(r'^    "([a-z0-9_]+)" ->')


def tier_of(name: str) -> str:
    for tier, prefixes in TIERS:
        for p in prefixes:
            if name.startswith(p):
                return tier
    return "CoreTier"


def find_block(lines, start_idx, end_idx):
    """Split lines[start_idx:end_idx] (the Seq interior) into entry blocks.
    Returns list of (name, [lines])."""
    starts = [i for i in range(start_idx, end_idx)
              if ENTRY_RE.match(lines[i])]
    blocks = []
    bounds = []
    for k, s in enumerate(starts):
        # walk upward over attached comment lines (and one leading blank)
        b = s
        while b - 1 >= start_idx and lines[b - 1].lstrip().startswith("//"):
            b -= 1
        if b - 1 >= start_idx and lines[b - 1].strip() == "":
            b -= 1
        bounds.append(b)
    bounds.append(end_idx)
    for k, s in enumerate(starts):
        name = ENTRY_RE.match(lines[s]).group(1)
        blk = lines[bounds[k]:bounds[k + 1]]
        # strip leading blank line (re-added when joining)
        while blk and blk[0].strip() == "":
            blk = blk[1:]
        while blk and blk[-1].strip() == "":
            blk = blk[:-1]
        # ensure the block ends with a trailing comma (last entry lacks one)
        if not blk[-1].rstrip().endswith(","):
            blk[-1] = blk[-1].rstrip() + ","
        blocks.append((name, blk))
    # sanity: nothing outside blocks except blanks
    covered = set()
    for k in range(len(starts)):
        covered.update(range(bounds[k], bounds[k + 1]))
    for i in range(start_idx, end_idx):
        if i not in covered and lines[i].strip() != "":
            print(f"UNCOVERED line {i+1}: {lines[i]!r}")
            sys.exit(1)
    return blocks


def main():
    lines = open(SRC).read().split("\n")

    def seq_bounds(decl_re):
        for i, l in enumerate(lines):
            if re.match(decl_re, l):
                start = i + 1
                for j in range(start, len(lines)):
                    if lines[j] == "  )":
                        return i, start, j
        raise SystemExit(f"decl not found: {decl_re}")

    qd, qs, qe = seq_bounds(r"  private val queriesSeq: ")
    od, os_, oe = seq_bounds(r"  private val oracleSqlSeq: ")

    qblocks = find_block(lines, qs, qe)
    oblocks = find_block(lines, os_, oe)
    qnames = [n for n, _ in qblocks]
    onames = [n for n, _ in oblocks]
    print(f"queries: {len(qblocks)} entries; oracles: {len(oblocks)}")
    assert sorted(qnames) == sorted(set(qnames)), "dup query entry"
    assert sorted(onames) == sorted(set(onames)), "dup oracle entry"
    assert set(qnames) == set(onames), (
        set(qnames) ^ set(onames))

    by_tier_q = {t: [] for t, _ in TIERS}
    by_tier_o = {t: [] for t, _ in TIERS}
    for n, blk in qblocks:
        by_tier_q[tier_of(n)].append((n, blk))
    for n, blk in oblocks:
        by_tier_o[tier_of(n)].append((n, blk))

    os.makedirs(OUT_DIR, exist_ok=True)
    for tier, _ in TIERS:
        qs_t = by_tier_q[tier]
        os_t = by_tier_o[tier]
        body_q = "\n\n".join("\n".join(b) for _, b in qs_t)
        body_o = "\n\n".join("\n".join(b) for _, b in os_t)
        content = f"""package graft

{IMPORTS}
/** {tier.replace('Tier', '').lower()}-tier slice of the driver registry —
  * moved verbatim out of SparkEntry (round-5 hygiene split; the Seq→Map
  * assembly, duplicate gate and 1:1 queries↔oracles check stay in
  * [[SparkEntry]]). Shared helpers live on SparkEntry as
  * `private[graft]` members. {len(qs_t)} queries / {len(os_t)} oracles. */
private[graft] object {tier} {{

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
{body_q}
  )

  val oracles: Seq[(String, String)] = Seq(
{body_o}
  )
}}
"""
        open(f"{OUT_DIR}/{tier}.scala", "w").write(content)
        print(f"{tier}: {len(qs_t)} queries, {len(os_t)} oracles")

    tier_names = [t for t, _ in TIERS]
    qrepl = ("  private val queriesSeq"
             ": Seq[(String, (SparkSession, String) => DataFrame)] =\n    "
             + " ++ ".join(f"{t}.queries" for t in tier_names))
    orepl = ("  private val oracleSqlSeq: Seq[(String, String)] =\n    "
             + " ++ ".join(f"{t}.oracles" for t in tier_names))

    out = lines[:qd] + [qrepl] + lines[qe + 1:od] + [orepl] + lines[oe + 1:]
    # note: slices above use original indices shifted — recompute carefully
    # (od/oe are indices in the ORIGINAL list; removing the queries region
    # shifts them, so rebuild in two passes instead)
    out = lines[:qd] + qrepl.split("\n") + lines[qe + 1:]
    shift = (qd + len(qrepl.split("\n"))) - (qe + 1)
    od2, oe2 = od + shift, oe + shift
    assert re.match(r"  private val oracleSqlSeq: ", out[od2]), out[od2]
    assert out[oe2] == "  )"
    out = out[:od2] + orepl.split("\n") + out[oe2 + 1:]
    open(SRC, "w").write("\n".join(out))
    print(f"SparkEntry rewritten: {len(lines)} -> {len(out)} lines")

    # widen helpers to private[graft]
    txt = open(SRC).read()
    txt2 = re.sub(r"(?m)^  private (def|val|lazy val) ",
                  r"  private[graft] \1 ", txt)
    open(SRC, "w").write(txt2)
    print("helpers widened to private[graft]")


if __name__ == "__main__":
    os.chdir("/root/repo")
    main()
