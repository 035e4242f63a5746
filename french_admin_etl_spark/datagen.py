"""Deterministic synthetic data generation (seeded, vectorized, no I/O deps).

Mirrors the reference's synthetic-fixture strategy
(``internal/processor/csv_processor_test.go:286-328`` builds a 1000-row
uniform CSV in-process) but generalized to the engine's two tables
(FIXTURES.md §1):

- ``repos``          base table: (repo, path, commit, lang, content)
- ``change_events``  ordered log: (lsn, ts, op, repo, path, commit, lang,
                     content, schema_version, props)

Generation knobs cover the mandated scenarios: duplicate delivery,
bounded out-of-order delivery, delete / delete-then-reinsert sequences,
Zipf-hot keys (popular repos), and schema-change markers. Everything is
numpy-vectorized so multi-million-event bench inputs generate in seconds.
"""

from __future__ import annotations

import binascii
import hashlib

import numpy as np
import pandas as pd

LANGS = np.array(["python", "go", "java", "rust", "ts", "sql", "md"])
_EXT = {"python": "py", "go": "go", "java": "java", "rust": "rs", "ts": "ts", "sql": "sql", "md": "md"}

EPOCH_2024 = pd.Timestamp("2024-01-01", tz=None)


def _commit_hex(keys: pd.Series) -> pd.Series:
    """Deterministic 40-hex 'commit' ids, fully vectorized.

    Two independent 64-bit vectorized hashes → 32 hex chars, padded to 40.
    (The earlier per-unique hashlib.sha1 loop was the datagen bottleneck at
    10^7+ events — one Python call per distinct key.)"""
    def hex16(h: pd.Series) -> np.ndarray:
        # uint64 → big-endian bytes → one hexlify call → fixed-width S16
        return np.frombuffer(
            binascii.hexlify(h.to_numpy().astype(">u8").tobytes()), dtype="S16"
        )

    h1 = pd.util.hash_pandas_object(keys, index=False, hash_key="0123456789abcdef")
    h2 = pd.util.hash_pandas_object(keys, index=False, hash_key="fedcba9876543210")
    out = np.char.add(np.char.add(hex16(h1), hex16(h2)), b"00000000")
    return pd.Series(out.astype("U40"), index=keys.index)


def make_keys(
    n_keys: int, n_repos: int, seed: int = 42, key_ns: str = ""
) -> pd.DataFrame:
    """n_keys distinct (repo, path) pairs across n_repos repos.

    Repo sizes are Zipf-ish so some repos own many paths (hot keys for the
    apply stage — north_rule: 'salts hot keys (popular repos)').
    ``key_ns`` prefixes every repo name — used to give log partitions
    disjoint key universes (a key-partitioned WAL's guarantee).
    """
    rng = np.random.default_rng(seed)
    # Zipf weights over repos
    w = 1.0 / np.arange(1, n_repos + 1, dtype=np.float64)
    w /= w.sum()
    repo_idx = rng.choice(n_repos, size=n_keys, p=w)
    repo = np.char.add(key_ns + "org", (repo_idx % 97).astype(str))
    repo = np.char.add(np.char.add(repo, "/project"), repo_idx.astype(str))
    lang = LANGS[rng.integers(0, len(LANGS), size=n_keys)]
    ext = pd.Series(lang).map(_EXT).to_numpy(dtype=object)
    path = np.char.add(
        np.char.add(np.char.add("src/module", (np.arange(n_keys) % 37).astype(str)), "/file"),
        np.char.add(np.arange(n_keys).astype(str), np.char.add(".", ext.astype(str))),
    )
    df = pd.DataFrame({"repo": repo, "path": path, "lang": lang})
    # distinct-ify any collisions (repo sampled with replacement, path unique already)
    return df


def _content(repo: pd.Series, path: pd.Series, version: np.ndarray, min_len: int = 64) -> pd.Series:
    """Deterministic pseudo-source text per (key, version)."""
    base = "def handler_%d(x):\n    return x * %d  # " % (0, 0)  # noqa: F841 (shape doc)
    body = (
        "// v" + pd.Series(version.astype(str), index=repo.index)
        + " " + repo.astype(str) + ":" + path.astype(str)
        + "\n" + ("fn main() { let x = compute(); emit(x); } " * max(1, min_len // 40))
    )
    return body


def gen_repos(n_keys: int = 1000, n_repos: int = 50, seed: int = 42) -> pd.DataFrame:
    """Base `repos` table in exactly the input_hint shape."""
    keys = make_keys(n_keys, n_repos, seed)
    version = np.zeros(n_keys, dtype=np.int64)
    content = _content(keys["repo"], keys["path"], version)
    return pd.DataFrame(
        {
            "repo": keys["repo"],
            "path": keys["path"],
            "commit": _commit_hex(keys["repo"] + "@" + keys["path"] + "@0"),
            "lang": keys["lang"],
            "content": content,
        }
    )


def gen_change_events(
    n_events: int = 10_000,
    n_keys: int = 1000,
    n_repos: int = 50,
    seed: int = 42,
    delete_rate: float = 0.05,
    duplicate_rate: float = 0.02,
    shuffle_window: int = 50,
    schema_change_lsns: list[int] | None = None,
    content_min_len: int = 64,
    key_ns: str = "",
    partial_update_rate: float = 0.0,
) -> pd.DataFrame:
    """Ordered change-event log with duplicates, out-of-order delivery,
    deletes (and hence delete-then-reinsert: a later I on a deleted key),
    and optional SCHEMA markers.

    Returned in **delivery order** (the row order of the frame); `lsn` is the
    authoritative total order. Delivery order deviates from LSN order within
    `shuffle_window` positions (bounded skew), and `duplicate_rate` of events
    appear twice (at-least-once delivery).
    """
    rng = np.random.default_rng(seed)
    keys = make_keys(n_keys, n_repos, seed, key_ns=key_ns)

    # Zipf over keys: hot keys receive many updates
    w = 1.0 / np.arange(1, n_keys + 1, dtype=np.float64) ** 1.1
    w /= w.sum()
    key_idx = rng.choice(n_keys, size=n_events, p=w)

    lsn = np.arange(1, n_events + 1, dtype=np.int64)
    # op: first touch of a key is I; subsequent are U except delete_rate D.
    first_touch = np.zeros(n_events, dtype=bool)
    seen: set[int] = set()
    # vectorized "first occurrence" via pandas duplicated
    first_touch = ~pd.Series(key_idx).duplicated().to_numpy()
    del seen
    op = np.where(first_touch, "I", np.where(rng.random(n_events) < delete_rate, "D", "U"))

    repo = keys["repo"].to_numpy()[key_idx]
    path = keys["path"].to_numpy()[key_idx]
    lang = keys["lang"].to_numpy()[key_idx]

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "repo": repo,
            "path": path,
            "lang": lang,
        }
    )
    df["ts"] = EPOCH_2024 + pd.to_timedelta(lsn * 37 + rng.integers(0, 29, n_events), unit="s")
    version = lsn  # content version == lsn: unique content per event
    content = _content(df["repo"], df["path"], version, min_len=content_min_len)
    df["commit"] = _commit_hex(df["repo"] + "@" + df["path"] + "@" + pd.Series(version).astype(str))
    df["content"] = content
    is_del = df["op"].to_numpy() == "D"
    df.loc[is_del, ["commit", "lang", "content"]] = None
    if partial_update_rate:
        # coalesce-mode streams: a fraction of NON-FIRST updates set only a
        # random non-empty subset of payload columns (null = "not updated")
        is_u = (df["op"].to_numpy() == "U")
        part = is_u & (rng.random(len(df)) < partial_update_rate)
        for col in ("commit", "lang", "content"):
            # drop each column independently, but never all three at once
            drop = part & (rng.random(len(df)) < 0.5)
            df.loc[drop, col] = None
        all_null = part & df[["commit", "lang", "content"]].isna().all(axis=1)
        if all_null.any():  # re-set content on fully-nulled updates
            restore = _content(
                df.loc[all_null, "repo"], df.loc[all_null, "path"],
                df.loc[all_null, "lsn"].to_numpy(), min_len=content_min_len,
            )
            df.loc[all_null, "content"] = restore.to_numpy()
    df["schema_version"] = np.int32(1)
    df["props"] = None

    # SCHEMA markers at requested LSN positions
    if schema_change_lsns:
        rows = []
        for i, at in enumerate(schema_change_lsns):
            rows.append(
                {
                    "lsn": np.int64(at),
                    "op": "SCHEMA",
                    "repo": None,
                    "path": None,
                    "lang": None,
                    "ts": EPOCH_2024 + pd.to_timedelta(int(at) * 37, unit="s"),
                    "commit": None,
                    "content": None,
                    "schema_version": np.int32(2 + i),
                    "props": '{"action": "add_column", "name": "extra_%d", "type": "long"}' % i,
                }
            )
        df = pd.concat([df, pd.DataFrame(rows)], ignore_index=True)
        df = df.sort_values("lsn", kind="stable").reset_index(drop=True)

    # duplicates: resample some rows (exact redelivery)
    n_dup = int(len(df) * duplicate_rate)
    if n_dup:
        dup_pos = rng.choice(len(df), size=n_dup, replace=False)
        df = pd.concat([df, df.iloc[dup_pos]], ignore_index=True)

    # bounded out-of-order delivery: jitter the delivery position
    jitter = rng.integers(0, max(1, shuffle_window), size=len(df))
    order = np.argsort(np.arange(len(df)) + jitter, kind="stable")
    df = df.iloc[order].reset_index(drop=True)
    df["schema_version"] = df["schema_version"].astype("int32")
    df["lsn"] = df["lsn"].astype("int64")
    # canonical column order == sources.event_log.EVENT_SCHEMA
    return df[["lsn", "ts", "op", "repo", "path", "commit", "lang", "content", "schema_version", "props"]]


def expected_final_state_coalesce(events: pd.DataFrame) -> pd.DataFrame:
    """Per-event COALESCE oracle: replay in LSN order; each non-null
    column assignment sticks, a delete resets the key (no resurrection of
    pre-delete columns). The pandas twin of the engine's coalesce path
    (dedup_coalesce fold + barrier merge + per-column read resolution);
    content_sha is derived from the FINAL content, mirroring the per-event
    sha derivation (null content → null sha → sha keeps the old value
    alongside the old content)."""
    ev = events[events["op"] != "SCHEMA"].sort_values("lsn", kind="stable")
    ev = ev.drop_duplicates(["repo", "path", "lsn"], keep="last")  # redelivery
    state: dict = {}
    for r in ev.itertuples(index=False):
        k = (r.repo, r.path)
        if r.op == "D":
            state[k] = None
            continue
        cur = state.get(k)
        if cur is None:
            cur = {"commit": None, "lang": None, "content": None}
        for col in ("commit", "lang", "content"):
            v = getattr(r, col)
            if v is not None and not (isinstance(v, float) and pd.isna(v)):
                cur[col] = v
        state[k] = cur
    rows = [
        {
            "repo": k[0], "path": k[1], **v,
            "content_sha": (
                hashlib.sha256(v["content"].encode()).hexdigest()
                if v["content"] is not None else None
            ),
        }
        for k, v in state.items() if v is not None
    ]
    return (
        pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content", "content_sha"])
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def _write_chunk(args) -> str:
    """One worker: generate a chunk of the event log and write it with
    pyarrow directly (no Spark round-trip)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    (i, out_dir, chunk_events, n_keys, n_repos, seed, content_min_len, key_ns) = args
    df = gen_change_events(
        n_events=chunk_events,
        n_keys=n_keys,
        n_repos=n_repos,
        seed=seed + i,
        content_min_len=content_min_len,
        key_ns=key_ns,
    )
    df["lsn"] = df["lsn"] + np.int64(i) * np.int64(chunk_events)
    schema = pa.schema(
        [
            ("lsn", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("op", pa.string()),
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("content", pa.string()),
            ("schema_version", pa.int32()),
            ("props", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    path = f"{out_dir}/part-{i:05d}.parquet"
    papq.write_table(table, path, compression="snappy", row_group_size=250_000)
    return path


def gen_event_log_parquet(
    out_dir: str,
    n_events: int,
    n_keys: int | None = None,
    n_repos: int | None = None,
    seed: int = 42,
    content_min_len: int = 256,
    chunk_events: int = 2_000_000,
    workers: int = 8,
    key_ns: str = "",
) -> int:
    """Benchmark-scale log generation: chunked across a process pool, each
    chunk written straight to parquet with pyarrow. 10-50x faster than the
    pandas→Spark createDataFrame path for 10^7+ events (that path serializes
    the whole frame through one Arrow stream on one thread).

    Chunks share the key universe but draw independently, with LSNs
    offset per chunk — exactly the shape of a partitioned WAL tail.
    Oracle note: for correctness tests use ``gen_change_events`` +
    ``expected_final_state`` at small scale; this generator is for
    throughput measurement.
    """
    import os
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    n_chunks = max(1, (n_events + chunk_events - 1) // chunk_events)
    per = n_events // n_chunks
    n_keys = n_keys if n_keys is not None else max(5000, n_events // 10)
    n_repos = n_repos if n_repos is not None else max(50, n_events // 1000)
    args = [
        (i, out_dir, per, n_keys, n_repos, seed, content_min_len, key_ns)
        for i in range(n_chunks)
    ]
    if n_chunks == 1:
        _write_chunk(args[0])
    else:
        with ProcessPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_write_chunk, args))
    return per * n_chunks


def expected_final_state(events: pd.DataFrame) -> pd.DataFrame:
    """Oracle: replay the log in LSN order → final (repo, path) state.

    Per key, the event with max LSN wins; key survives iff that op != 'D'.
    This is the pandas twin of the engine's W1 dedup + MERGE semantics,
    mirroring the reference's idempotent-upsert convergence property
    (``region_repository.go:38-42``).
    """
    ev = events[events["op"] != "SCHEMA"]
    ev = ev.sort_values("lsn").drop_duplicates(["repo", "path"], keep="last")
    live = ev[ev["op"] != "D"]
    out = live[["repo", "path", "commit", "lang", "content"]].reset_index(drop=True)
    out["content_sha"] = out["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


# --------------------------------------------------------------- multi-table

def gen_cog_events(
    n_regions: int = 5,
    n_departments: int = 20,
    n_communes: int = 200,
    n_updates: int = 500,
    seed: int = 42,
) -> pd.DataFrame:
    """Multi-table envelope log mirroring the reference's COG entity DAG
    (region <- department <- commune, ``migrations/000001-000003``): one
    totally-ordered stream, each event tagged with its table and carrying
    the row as a JSON payload (the Debezium-envelope shape read by
    ``sources/envelope_log.py``).

    Phase 1 (bootstrap) inserts regions, then departments, then communes —
    the reference's file-load order (``cmd/main.go:110-120``), which also
    makes every LSN-prefix of the stream FK-consistent. Phase 2 mixes
    commune population updates / renames / re-parents (to live
    departments), commune deletes and delete-then-reinserts, and
    department renames. Deterministic under ``seed``. JSON payloads are
    built in one Python pass — test/bench scale only (the engine reads the
    envelope; producing it is the upstream CDC tool's job).
    """
    import json as _json

    rng = np.random.default_rng(seed)
    regions = [{"code": f"REG{i:02d}", "name": f"Region {i}"} for i in range(n_regions)]
    departments = [
        {
            "code": f"D{i:03d}",
            "region_code": f"REG{int(rng.integers(0, n_regions)):02d}",
            "name": f"Department {i}",
        }
        for i in range(n_departments)
    ]
    communes = [
        {
            "code": f"C{i:05d}",
            "department_code": f"D{int(rng.integers(0, n_departments)):03d}",
            "name": f"Commune {i}",
            "population": int(rng.integers(100, 100_000)),
        }
        for i in range(n_communes)
    ]

    rows: list[tuple] = []  # (op, table, payload_dict)
    for r in regions:
        rows.append(("I", "region", r))
    for d in departments:
        rows.append(("I", "department", d))
    for c in communes:
        rows.append(("I", "commune", c))

    live = {c["code"]: dict(c) for c in communes}
    # O(1)-per-event bookkeeping (bench runs this at 10^5-10^6 updates):
    # swap-remove list of live codes instead of list(live) per iteration,
    # and all random draws precomputed as arrays
    live_codes = [c["code"] for c in communes]
    live_pos = {code: i for i, code in enumerate(live_codes)}
    dead: list[str] = []
    kinds = rng.choice(
        ["pop", "rename", "reparent", "delete", "reinsert", "dept_rename"],
        size=n_updates,
        p=[0.55, 0.15, 0.10, 0.08, 0.05, 0.07],
    )
    draw_idx = rng.random(n_updates)  # uniform [0,1) -> scaled index picks
    draw_dept = rng.integers(0, n_departments, size=n_updates)
    draw_pop = rng.integers(100, 100_000, size=n_updates)
    for i in range(n_updates):
        kind = kinds[i]
        if kind == "dept_rename":
            d = departments[int(draw_dept[i])]
            d = dict(d, name=d["name"] + "'")
            rows.append(("U", "department", d))
            continue
        if kind == "reinsert" and dead:
            code = dead.pop(int(draw_idx[i] * len(dead)))
            c = {
                "code": code,
                "department_code": f"D{int(draw_dept[i]):03d}",
                "name": f"Commune {code} reborn",
                "population": int(draw_pop[i]),
            }
            live[code] = c
            live_pos[code] = len(live_codes)
            live_codes.append(code)
            rows.append(("I", "commune", c))
            continue
        if not live_codes:
            continue
        code = live_codes[int(draw_idx[i] * len(live_codes))]
        c = dict(live[code])
        if kind == "pop":
            c["population"] = int(draw_pop[i])
        elif kind == "rename":
            c["name"] = c["name"] + "*"
        elif kind == "reparent":
            c["department_code"] = f"D{int(draw_dept[i]):03d}"
        elif kind == "delete":
            del live[code]
            dead.append(code)
            # swap-remove from live_codes, patch the moved code's position
            j = live_pos.pop(code)
            last = live_codes.pop()
            if last != code:
                live_codes[j] = last
                live_pos[last] = j
            rows.append(("D", "commune", {"code": code}))
            continue
        live[code] = c
        rows.append(("U", "commune", c))

    lsn = np.arange(1, len(rows) + 1, dtype=np.int64)
    return pd.DataFrame(
        {
            "lsn": lsn,
            "ts": EPOCH_2024 + pd.to_timedelta(lsn, unit="s"),
            "op": [r[0] for r in rows],
            "table": [r[1] for r in rows],
            "payload": [_json.dumps(r[2], sort_keys=True) for r in rows],
            "schema_version": np.int32(1),
            "props": None,
        }
    )


def expected_cog_state(events: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Oracle: per-table replay of a ``gen_cog_events`` stream — per key
    the max-LSN event wins, the key survives iff that op != 'D'."""
    import json as _json

    out: dict[str, pd.DataFrame] = {}
    for table, key in (("region", "code"), ("department", "code"), ("commune", "code")):
        ev = events[(events["table"] == table) & (events["op"] != "SCHEMA")].copy()
        payload = pd.DataFrame([_json.loads(p) for p in ev["payload"]])
        payload["lsn"] = ev["lsn"].to_numpy()
        payload["op"] = ev["op"].to_numpy()
        last = payload.sort_values("lsn").drop_duplicates([key], keep="last")
        final = last[last["op"] != "D"].drop(columns=["lsn", "op"])
        out[table] = final.sort_values(key).reset_index(drop=True)
    return out
