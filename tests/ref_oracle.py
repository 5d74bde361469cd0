"""Pure-Python reimplementation of the reference pipeline semantics.

Operates directly on the synthesizer's fact model (NOT on spans), giving an
oracle independent of both the Spark implementation and the DuckDB SQL: it
mirrors bin/filter_*.py row loops and the Postgres SQL of
steps/{wikipedia,wikidata}_process.sh and steps/output.sh, with the same
deterministic tie-breaks documented in plans/importance.py.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from wikipedia_wikidata_spark.config import LANGUAGES, PLACE_TYPE_LEVELS


def reference_importance(facts: dict, languages: list[str] | None = None):
    languages = languages or LANGUAGES
    L_set = set(languages)

    # --- bin/filter_page.py ---
    page: dict[str, dict[int, str]] = {}
    for L in languages:
        d = {}
        for pid, ns, title, _ in facts["pages"][L]:
            t = title.replace("\r", "")
            if ns == 0 and t:
                d[pid] = t
        page[L] = d

    # --- bin/filter_redirect.py (linktarget + redirect) ---
    lt: dict[str, dict[int, str]] = {}
    for L in languages:
        d = {}
        for lt_id, ns, t0 in facts["linktargets"][L]:
            t = t0.replace("\r", "")
            if ns == 0 and t:
                d[lt_id] = t
        lt[L] = d
    redirect: dict[str, list[tuple[int, str]]] = {}
    for L in languages:
        redirect[L] = [
            (rf, t0.replace("\r", ""))
            for rf, ns, t0 in facts["redirects"][L]
            if ns == 0 and t0.replace("\r", "")
        ]

    # --- bin/filter_pagelinks.py: J1 + A1 ---
    plc: dict[str, dict[str, int]] = {}
    for L in languages:
        counts: dict[str, int] = defaultdict(int)
        for _, ns, tgt in facts["pagelinks"][L]:
            if ns != 0:
                continue
            t = lt[L].get(tgt)
            if t is not None:
                counts[t] += 1
        plc[L] = dict(counts)

    # --- bin/filter_langlinks.py ---
    ll: dict[str, list[tuple[int, str, str]]] = {}
    for L in languages:
        ll[L] = [
            (f, o, t.replace("\r", "").replace(" ", "_"))
            for f, o, t in facts["langlinks"][L]
            if o in L_set
        ]

    # --- steps/wikipedia_process.sh:52-71: othercount ---
    oc: dict[str, dict[str, int]] = {}
    for W in languages:
        acc: dict[str, int] = defaultdict(int)
        for llf, O, t in ll[W]:
            pt = page[W].get(llf)
            if pt is None:
                continue
            cnt = plc.get(O, {}).get(t)
            if cnt is not None:
                acc[pt] += cnt
        oc[W] = acc

    # --- article_full ---
    article_full: dict[tuple[str, str], int] = {}
    for W in languages:
        for title, lc in plc[W].items():
            article_full[(W, title)] = lc + oc[W].get(title, 0)

    # --- bin/filter_wikidata_page.py ---
    wd_page = {
        pid: t for pid, ns, t in facts_wd_pages(facts) if ns == 0 and t.startswith("Q")
    }

    # --- bin/filter_wikidata_geo_tags.py ---
    geo = []
    for gt_page_id, globe, primary, lat_s, lon_s in facts["geo_rows"]:
        if globe != "earth" or primary != 1:
            continue
        lat, lon = float(lat_s), float(lon_s)
        if lat == 0 and lon == 0:
            continue
        if lat < -90 or lat > 90 or lon < -180 or lon > 180:
            continue
        geo.append((gt_page_id, round(lat, 5), round(lon, 5)))

    # --- geo_earth_wikidata (J5+A5) + deterministic coordinate pick (J7) ---
    geo_earth = {(g, la, lo, wd_page.get(g)) for g, la, lo in geo}
    geo_pick: dict[str, tuple[float, float]] = {}
    best: dict[str, tuple] = {}
    for g, la, lo, t in geo_earth:
        if t is None:
            continue
        k = (la, lo, g)
        if t not in best or k < best[t]:
            best[t] = k
    geo_pick = {t: (k[0], k[1]) for t, k in best.items()}

    # --- places (P8 + J6 + A6 deterministic pick) ---
    levels = dict(PLACE_TYPE_LEVELS)
    place_pairs = sorted(
        {(it, io) for it, io in facts["place_rows"] if it.startswith("Q")}
    )
    by_item: dict[str, list[tuple[str, int | None]]] = defaultdict(list)
    for it, io in place_pairs:
        by_item[it].append((io, levels.get(io)))
    wikidata_places = {}
    for it, cands in by_item.items():
        cands.sort(key=lambda c: (c[1] is None, -(c[1] or 0), c[0]))
        io, lvl = cands[0]
        la, lo = geo_pick.get(it, (None, None))
        wikidata_places[it] = (io, lvl, la, lo)

    # --- sitelinks (P6) ---
    sl_by_id: dict[int, list[tuple[str, str]]] = defaultdict(list)
    for _, qnum, site, p0 in facts["sitelinks"]:
        t = p0.replace("\r", "")
        if t and site.replace("wiki", "") in L_set:
            sl_by_id[qnum].append((site, t))

    # --- wikidata_pages (J8) + wp_pick (J9 tie-break) ---
    sites = {f"{L}wiki": L for L in languages}
    wp_rows = []
    for it, (io, lvl, la, lo) in wikidata_places.items():
        try:
            qnum = int(it.lstrip("Q"))
        except ValueError:
            continue
        for site, t in sl_by_id.get(qnum, []):
            if site in sites:
                wp_rows.append(
                    (sites[site], t.replace(" ", "_"), it, io, la, lo)
                )
    wp_pick: dict[tuple[str, str], tuple] = {}
    for L, wt, it, io, la, lo in wp_rows:
        k = (L, wt)
        if k not in wp_pick or (it, io) < (wp_pick[k][0], wp_pick[k][1]):
            wp_pick[k] = (it, io, la, lo)

    # --- scoring (A4 + F6) ---
    max_total = max(
        (tc for (L, t), tc in article_full.items() if (L, t) in wp_pick),
        default=None,
    )
    article = {}
    for (L, t), tc in article_full.items():
        w = wp_pick.get((L, t))
        # np.log10, not math.log10: the engine computes the ratio with a
        # numpy Arrow UDF (plans/importance.log10_ratio_floor) and numpy's
        # scalar/SIMD log10 are bit-equal while java.lang.Math.log10 is 1 ulp
        # off on ~2% of inputs — this keeps oracle and engine bit-identical,
        # which the byte-exact TSV golden requires.
        imp = max(
            float(np.log10(np.float64(tc)) / np.log10(np.float64(max_total))),
            1e-10,
        )
        if w is not None and imp != 0:
            article[(L, t)] = (imp, w[0])

    # --- output shaping (steps/output.sh) ---
    out = {}
    for (L, t), (imp, wid) in article.items():
        out[(L, "a", t)] = (imp, wid)
    page_inv = page  # page_id -> title
    for L in languages:
        for rf, rt in redirect[L]:
            ft = page_inv[L].get(rf)
            if ft is None:
                continue
            a = article.get((L, rt))
            if a is None:
                continue
            if (L, ft) in article:  # anti-join on (language, title)
                continue
            out[(L, "r", ft)] = a
    return out


def facts_wd_pages(facts: dict):
    """Enumerate wikidata page rows: per-item clean rows + the dirty dump."""
    for j in range(len(facts["item_langs"])):
        yield (facts["wd_page_id"][j], 0, f"Q{1000 + j}")
    yield (80_000_001, 0, "XNotanitem")
    yield (80_000_002, 120, "Q777777")
