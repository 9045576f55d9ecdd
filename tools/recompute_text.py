#!/usr/bin/env python3
"""Independent recomputation witness for the dedup / text / retrieval
queries — fourth companion to recompute_stats.py, covering the
LLM-pipeline surface: MinHash+LSH banding, shingle-Jaccard pairs with
df-capped postings, BM25 ranking, BPE-ish token counting, and the
stopword-heuristic language ID. Everything is redone from the raw
documents parquet with hashlib + a hand-rolled unicode scanner — no SQL
split/regex engines, no Spark.

Usage: python3 tools/recompute_text.py <sfDir> <verifyOutDir>
"""
import sys, glob, os, hashlib, unicodedata
import pyarrow.parquet as pq


def engine_rows(out_dir, q):
    f = glob.glob(os.path.join(out_dir, q, "*.parquet"))
    assert f, f"no engine output for {q}"
    return pq.read_table(f[0]).to_pylist()


def check(name, cond, detail=""):
    print(f"  {'OK ' if cond else 'MISMATCH'} {name}{' ' + detail if detail else ''}")
    return bool(cond)


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def shingles(text):
    toks = text.split(" ")
    return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}


def main(sf_dir, out_dir):
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    dids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    ok = True

    # --- q_minhash_pairs: 8 md5 minhashes over 3-gram shingles (lexico
    # min of hex digests), 4 bands of md5(m_{2i}||m_{2i+1}), candidates
    # share a band bucket, kept when >=4 of 8 signature slots agree
    print("q_minhash_pairs")
    sig = {}
    for did, text in zip(dids, texts):
        sh = shingles(text)
        sig[did] = [min(md5hex(f"{k}|{s}") for s in sh) for k in range(8)]
    buckets = {}
    for did, m in sig.items():
        for band in range(4):
            buckets.setdefault(
                (band, md5hex(m[2 * band] + m[2 * band + 1])), []).append(did)
    pairs = set()
    for ds in buckets.values():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                a, b = min(ds[i], ds[j]), max(ds[i], ds[j])
                pairs.add((a, b))
    want = sorted(
        (d1, d2, sum(1 for k in range(8) if sig[d1][k] == sig[d2][k]) / 8.0)
        for d1, d2 in pairs
        if sum(1 for k in range(8) if sig[d1][k] == sig[d2][k]) / 8.0 >= 0.5)
    got = [(r["d1"], r["d2"], r["est_sim"])
           for r in engine_rows(out_dir, "q_minhash_pairs")]
    ok &= check("LSH candidate pairs + est_sim", got == want,
                f"({len(got)} engine vs {len(want)} independent pairs)")

    # --- q_jaccard_pairs: same-language doc pairs sharing df<=50 3-gram
    # shingles, Jaccard over KEPT shingles >= 0.5
    print("q_jaccard_pairs")
    df = {}
    doc_sh = {}
    for did, text in zip(dids, texts):
        sh = shingles(text)
        doc_sh[did] = sh
        for s in sh:
            df[s] = df.get(s, 0) + 1
    kept = {did: {s for s in sh if df[s] <= 50} for did, sh in doc_sh.items()}
    lang_of = dict(zip(dids, langs))
    want = []
    ds_sorted = sorted(kept)
    inv = {}
    for did in ds_sorted:
        for s in kept[did]:
            inv.setdefault(s, []).append(did)
    cand = {}
    for s, ds in inv.items():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                if lang_of[ds[i]] == lang_of[ds[j]]:
                    key = (min(ds[i], ds[j]), max(ds[i], ds[j]))
                    cand[key] = cand.get(key, 0) + 1
    for (d1, d2), inter in sorted(cand.items()):
        jac = inter / (len(kept[d1]) + len(kept[d2]) - inter)
        if jac >= 0.5:
            want.append((d1, d2, inter, jac))
    got = [(r["d1"], r["d2"], r["inter_cnt"], r["jaccard"])
           for r in engine_rows(out_dir, "q_jaccard_pairs")]
    ok &= check("df-capped Jaccard pairs", sorted(got) == sorted(want),
                f"engine={sorted(got)[:2]} independent={sorted(want)[:2]}")

    # --- q_bm25: top-20 for (spark, window, hash), K1=1.2 B=0.75,
    # log-free rational idf (the engine's documented oracle-pinned form)
    print("q_bm25")
    terms = ["spark", "window", "hash"]
    tf = {did: [t.split(" ").count(q_) for q_ in terms]
          for did, t in zip(dids, texts)}
    dl = {did: len(t.split(" ")) for did, t in zip(dids, texts)}
    n = len(dids)
    avgdl = sum(dl.values()) / n
    dfs = [sum(1 for did in dids if tf[did][i] > 0) for i in range(3)]
    scored = []
    for did in dids:
        if not any(tf[did]):
            continue
        s = 0.0
        for i in range(3):
            f_ = float(tf[did][i])
            if f_ > 0:
                idf = (n - dfs[i] + 0.5) / (dfs[i] + 0.5)
                s += idf * (f_ * 2.2) / (f_ + 1.2 * (1 - 0.75 + 0.75 * dl[did] / avgdl))
        scored.append((round(s, 6), did))
    top = sorted(scored, key=lambda t: (-t[0], t[1]))[:20]
    got = [(r["score"], r["doc_id"]) for r in engine_rows(out_dir, "q_bm25")]
    ok &= check("top-20 (score, doc)", got == top,
                f"engine[0]={got[0]} independent[0]={top[0]}")

    # --- q_token_stats: whitespace tokens vs the BPE-ish scanner
    # ' ?[L]+ | ?[N]+ | ?[^\s L N]+' — reimplemented as a hand-rolled
    # left-to-right scanner over unicode categories, no regex engine
    print("q_token_stats")
    def cls(c):
        if c.isspace():
            return "s"
        cat = unicodedata.category(c)[0]
        return "L" if cat == "L" else ("N" if cat == "N" else "O")
    def bpe_count(txt):
        cnt, i, nn = 0, 0, len(txt)
        while i < nn:
            j = i + 1 if (txt[i] == " " and i + 1 < nn) else i
            c = cls(txt[j]) if j < nn else "s"
            if c != "s":
                k = j
                while k < nn and cls(txt[k]) == c:
                    k += 1
                cnt += 1
                i = k
            else:
                i += 1
        return cnt
    got = {r["doc_id"]: r for r in engine_rows(out_dir, "q_token_stats")}
    bad = []
    for did, text in zip(dids, texts):
        txt = f"{text} v{did % 10}.{did % 7}, cost ${did % 100}!"
        ws = len(txt.split(" "))
        bpe = bpe_count(txt)
        chars = len(txt)
        r = got[did]
        if (r["ws_tokens"], r["bpe_tokens"], r["chars"]) != (ws, bpe, chars) \
                or abs(r["fertility"] - round(chars / bpe, 6)) > 1e-12:
            bad.append((did, (r["ws_tokens"], r["bpe_tokens"], r["chars"]),
                        (ws, bpe, chars)))
    ok &= check("ws/bpe/char counts on all docs", not bad,
                f"first diff: {bad[:1]}")

    # --- q_lang_id: kana/han script detection + stopword-hit argmax
    # with the pinned tie order fr > es > en > de
    print("q_lang_id")
    stop = {"en": {"the", "and", "of", "is", "with", "for"},
            "de": {"der", "die", "das", "und", "nicht", "mit"},
            "fr": {"le", "la", "les", "et", "est", "dans"},
            "es": {"el", "los", "las", "es", "y", "en"}}
    def is_kana(c):
        o = ord(c)
        return 0x3040 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF or 0xFF66 <= o <= 0xFF9D
    def is_han(c):
        try:
            return unicodedata.name(c).startswith("CJK UNIFIED")
        except ValueError:
            return False
    got = {r["doc_id"]: r["lang_id"] for r in engine_rows(out_dir, "q_lang_id")}
    bad = []
    for did, text in zip(dids, texts):
        low = text.lower()
        toks = set()
        cur = []
        for c in low + "\x00":
            if unicodedata.category(c)[0] == "L":
                cur.append(c)
            else:
                if cur:
                    toks.add("".join(cur))
                cur = []
        if any(is_kana(c) for c in text):
            lang = "ja"
        elif any(is_han(c) for c in text):
            lang = "zh"
        else:
            hits = {l_: len(toks & s_) for l_, s_ in stop.items()}
            g = max(hits.values())
            if g == 0:
                lang = "und"
            elif hits["fr"] == g:
                lang = "fr"
            elif hits["es"] == g:
                lang = "es"
            elif hits["en"] == g:
                lang = "en"
            else:
                lang = "de"
        if got[did] != lang:
            bad.append((did, got[did], lang))
    ok &= check("language id on all docs", not bad, f"first diff: {bad[:3]}")

    print("\nALL MATCH" if ok else "\nMISMATCHES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
