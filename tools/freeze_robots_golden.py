"""Freeze the robots goldens: (1) the rules table produced by the
kernel parser in-process (``robots_rules_golden.parquet`` — the oracle
for the distributed parse route), and (2) the deterministic frontier URL
list (``robots_urls_golden.parquet`` — the INPUT fixture the
``robots_frontier`` oracle SQL reads so it can recompute the
longest-match verdicts independently from the frozen rules).

Rerun (and commit the result) only when robots semantics intentionally
change:  python tools/freeze_robots_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import (  # noqa: E402
    gen_robots_rows,
    gen_sitemap_rows,
)
from pdf_ocr_spark.kernels.robots import (  # noqa: E402
    parse_crawl_delays,
    parse_robots,
    parse_sitemap_xml,
    parse_sitemaps,
)

N_DOMAINS = 25  # must match q_robots_rules / q_robots_frontier

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures",
)


def golden_frames() -> tuple:
    robots, urls = gen_robots_rows(N_DOMAINS)
    rows = []
    for r in robots:
        for rule in parse_robots(bytes(r["body"]).decode("utf-8")):
            rows.append(
                (r["domain"], rule.agent, rule.allow, rule.pattern,
                 rule.regex, rule.specificity, rule.order)
            )
    rules = pd.DataFrame(
        rows,
        columns=["domain", "agent", "allow", "pattern", "regex",
                 "specificity", "rule_order"],
    ).sort_values(
        ["domain", "rule_order", "agent"], kind="mergesort"
    ).reset_index(drop=True)
    drows = []
    for r in robots:
        for agent, delay in parse_crawl_delays(bytes(r["body"]).decode("utf-8")):
            drows.append((r["domain"], agent, delay))
    delays = pd.DataFrame(
        drows, columns=["domain", "agent", "delay_s"]
    ).sort_values(["domain", "agent"], kind="mergesort").reset_index(drop=True)
    srows = []
    for r in robots:
        for i, u in enumerate(parse_sitemaps(bytes(r["body"]).decode("utf-8"))):
            srows.append((r["domain"], u, i))
    sitemaps = pd.DataFrame(
        srows, columns=["domain", "sitemap_url", "sm_index"]
    ).sort_values(["domain", "sm_index"], kind="mergesort").reset_index(drop=True)
    smrows = []
    for r in gen_sitemap_rows(20):  # must match q_sitemap_urls
        for loc, lastmod, kind in parse_sitemap_xml(bytes(r["body"])):
            smrows.append((r["url"], loc, lastmod, kind))
    sm_urls = pd.DataFrame(
        smrows, columns=["sitemap", "loc", "lastmod", "kind"]
    ).sort_values(["sitemap", "loc"], kind="mergesort").reset_index(drop=True)
    return rules, pd.DataFrame({"url": urls}), delays, sitemaps, sm_urls


if __name__ == "__main__":
    rules, urls, delays, sitemaps, sm_urls = golden_frames()
    rules.to_parquet(
        os.path.join(FIXTURES, "robots_rules_golden.parquet"), index=False
    )
    urls.to_parquet(
        os.path.join(FIXTURES, "robots_urls_golden.parquet"), index=False
    )
    delays.to_parquet(
        os.path.join(FIXTURES, "robots_delays_golden.parquet"), index=False
    )
    sitemaps.to_parquet(
        os.path.join(FIXTURES, "robots_sitemaps_golden.parquet"), index=False
    )
    sm_urls.to_parquet(
        os.path.join(FIXTURES, "sitemap_urls_golden.parquet"), index=False
    )
    print(f"wrote {len(rules)} rules, {len(urls)} urls, {len(delays)} delays, "
          f"{len(sitemaps)} sitemaps, {len(sm_urls)} sitemap urls")
