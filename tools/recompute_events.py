#!/usr/bin/env python3
"""Independent recomputation witness for the event-sequence queries —
fifth companion to recompute_stats.py: sessionization (gap > 1h),
ordered view→click→purchase funnel, and day-streak islands, all redone
from the raw events parquet with plain-python loops over sorted event
lists (no window functions, no SQL).

Usage: python3 tools/recompute_events.py <sfDir> <verifyOutDir>
"""
import sys, glob, os
import pyarrow.parquet as pq
import pyarrow.compute as pc


def engine_rows(out_dir, q):
    f = glob.glob(os.path.join(out_dir, q, "*.parquet"))
    assert f, f"no engine output for {q}"
    return pq.read_table(f[0]).to_pylist()


def check(name, cond, detail=""):
    print(f"  {'OK ' if cond else 'MISMATCH'} {name}{' ' + detail if detail else ''}")
    return bool(cond)


def main(sf_dir, out_dir):
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["user_id", "event_id", "event_type", "value",
                                "ts"])
    # parquet timestamps -> epoch millis (floor), matching DuckDB's
    # epoch_ms and the engine's unix_millis; divisor derives from the
    # column's actual arrow unit so a us- vs ns-precision corpus can't
    # silently shift the scale by 1000
    unit = ev.schema.field("ts").type.unit
    div = {"ms": 1, "us": 1_000, "ns": 1_000_000}[unit]  # sub-ms units only
    ts_ms = [t // div for t in pc.cast(ev.column("ts"), "int64").to_pylist()]
    users = ev.column("user_id").to_pylist()
    eids = ev.column("event_id").to_pylist()
    etypes = ev.column("event_type").to_pylist()
    vals_cents = [int(round(float(v) * 100)) for v in ev.column("value").to_pylist()]
    ok = True

    # --- q_sessions: per-user events ordered by (ms, event_id), new
    # session when the gap exceeds one hour; exact decimal session value
    print("q_sessions")
    per_user = {}
    for u, e, t, v in zip(users, eids, ts_ms, vals_cents):
        per_user.setdefault(u, []).append((t, e, v))
    want = []
    for u in sorted(per_user):
        evs = sorted(per_user[u])
        seq = 0
        cur = None  # (start, end, cnt, cents)
        prev_t = None
        for t, _, v in evs:
            if prev_t is None or t - prev_t > 3600000:
                if cur:
                    want.append((u, seq, cur[2], cur[0], cur[1],
                                 cur[3] / 100.0, cur[1] - cur[0]))
                seq += 1
                cur = [t, t, 1, v]
            else:
                cur[1] = t
                cur[2] += 1
                cur[3] += v
            prev_t = t
        if cur:
            want.append((u, seq, cur[2], cur[0], cur[1],
                         cur[3] / 100.0, cur[1] - cur[0]))
    got = [(r["user_id"], r["session_seq"], r["event_cnt"], r["start_ms"],
            r["end_ms"], r["session_value"], r["duration_ms"])
           for r in engine_rows(out_dir, "q_sessions")]
    ok &= check("all sessions (bounds, counts, values)", got == want,
                f"({len(got)} engine vs {len(want)} independent sessions)")

    # --- q_funnel: strictly-ordered first-view -> first-later-click ->
    # first-later-purchase per user
    print("q_funnel")
    by_user = {}
    for u, t, k in zip(users, ts_ms, etypes):
        by_user.setdefault(u, []).append((t, k))
    viewed = clicked = purchased = 0
    for u, evs in by_user.items():
        views = [t for t, k in evs if k == "view"]
        if not views:
            continue
        viewed += 1
        t0 = min(views)
        clicks = [t for t, k in evs if k == "click" and t > t0]
        if not clicks:
            continue
        clicked += 1
        t1 = min(clicks)
        if any(t > t1 for t, k in evs if k == "purchase"):
            purchased += 1
    r = engine_rows(out_dir, "q_funnel")[0]
    ok &= check("funnel counts",
                (r["viewed"], r["clicked"], r["purchased"]) ==
                (viewed, clicked, purchased),
                f"engine={r} independent=({viewed},{clicked},{purchased})")
    ok &= check("rates", abs(r["click_rate"] - clicked / viewed) <= 1e-12 and
                abs(r["purchase_rate"] - purchased / clicked) <= 1e-12)

    # --- q_streaks: consecutive-active-day islands per user
    print("q_streaks")
    days_by_user = {}
    for u, t in zip(users, ts_ms):
        days_by_user.setdefault(u, set()).add(t // 86400000)
    want2 = []
    for u in sorted(days_by_user):
        ds = sorted(days_by_user[u])
        runs = []
        start = prev = ds[0]
        for d in ds[1:]:
            if d == prev + 1:
                prev = d
            else:
                runs.append(prev - start + 1)
                start = prev = d
        runs.append(prev - start + 1)
        want2.append((u, sum(runs), max(runs), len(runs)))
    got2 = [(r["user_id"], r["active_days"], r["longest_streak"], r["n_streaks"])
            for r in engine_rows(out_dir, "q_streaks")]
    ok &= check("per-user streak islands", got2 == want2,
                f"engine[0]={got2[:1]} independent[0]={want2[:1]}")

    print("\nALL MATCH" if ok else "\nMISMATCHES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
