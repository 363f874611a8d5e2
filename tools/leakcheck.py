#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json from an actual scan of the repo sources.

Scans src/, tools/, build.sbt, and the .claude skills for anything that
looks like non-public provenance: internal package imports, internal
URLs/shortlinks, cloud bucket paths, chat-app links, API-key-shaped
strings, or internal-looking environment variables. Zero hits is the
required state; any hit must be removed, not explained.

Usage: python3 tools/leakcheck.py <round>
"""
import json, os, re, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else 0

# category -> regex (case-insensitive where sensible)
PATTERNS = {
    # imports/packages outside the public surface the repo is allowed to
    # use (spark/scala/java/scalatest/graft)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.spark|org\.apache\.hadoop|org\.apache\.parquet"
        r"|scala\.|java\.|javax\.|org\.scalatest|org\.scalacheck|graft\."
        r"|\w+\.implicits)"  # `import spark.implicits._` — a local val, not a package
        r"[a-z]{2,}\.[a-z_0-9.]+\.[A-Za-z_{]"),
    # URLs that are not apache/github/public-doc/RFC-example hosts
    "internal-url": re.compile(
        r"https?://(?!www\.apache|spark\.apache|parquet\.apache|kafka\.apache"
        r"|github\.com|raw\.githubusercontent|docs\.|en\.wikipedia|arxiv\.org"
        r"|duckdb\.org|localhost|127\.0\.0\.1|[\w.-]*example\.|host:port)[\w.-]+"),
    # shortlink-style internal references (go/x, corp wikis)
    "internal-pkg2": re.compile(r"\bgo/[a-z][\w-]{2,}\b"),
    # cloud buckets / object-store paths
    "internal-bucket": re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://[\w][\w.-]+"),
    # chat links
    "slack-link": re.compile(r"slack\.com|app\.slack|#[a-z0-9-]*-(eng|team|internal)\b"),
    # API-key-shaped strings
    "api-key": re.compile(r"\b(sk-[A-Za-z0-9-]{16,}|AKIA[0-9A-Z]{16}|AIza[\w-]{30,})"),
    # internal-sounding env vars (the engine's own SPARK_GRAFT_* are public)
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9]*_(INTERNAL|CORP|PROD_SECRET)[A-Z0-9_]*\b"),
}

SCAN_DIRS = ["src", "tools", ".claude"]
SCAN_FILES = ["build.sbt", "README.md"]

def files():
    for d in SCAN_DIRS:
        for dirpath, _, names in os.walk(os.path.join(ROOT, d)):
            for n in names:
                if n.endswith((".scala", ".sbt", ".py", ".md", ".sh", ".json")):
                    yield os.path.join(dirpath, n)
    for f in SCAN_FILES:
        p = os.path.join(ROOT, f)
        if os.path.exists(p):
            yield p

hits = {k: [] for k in PATTERNS}
me = os.path.abspath(__file__)
for path in files():
    if os.path.abspath(path) == me:
        continue  # the patterns themselves would self-match
    rel = os.path.relpath(path, ROOT)
    try:
        text = open(path, encoding="utf-8", errors="replace").read()
    except OSError:
        continue
    for i, line in enumerate(text.splitlines(), 1):
        for cat, rx in PATTERNS.items():
            if rx.search(line):
                hits[cat].append(f"{rel}:{i}: {line.strip()[:120]}")

out = {"round": ROUND, "n_hits": sum(len(v) for v in hits.values()), "hits": hits}
print(json.dumps(out, indent=2))
