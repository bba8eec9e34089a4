"""Persistence: database directory, checkpoint, logical WAL.

The reference persists to a single block file + WAL (src/storage/
single_file_block_manager.cpp, write_ahead_log.cpp; replay at
wal_replay.cpp:354). Here the durable format is a directory:

  <db>/catalog.json            table/view definitions + row counts
  <db>/data/<table>/           binary columnar files (meta.json,
                               <col>.i64/.i32/.f64, <col>.len/.bytes,
                               <col>.valid) — same format the native
                               loaders emit, so checkpointed tables mmap
                               straight back in
  <db>/wal.sql                 logical WAL: statements since checkpoint

CHECKPOINT writes all dirty tables + truncates the WAL (the reference's
checkpoint-truncates-WAL contract); opening replays catalog.json then the
WAL (crash recovery).
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
from typing import Dict

import numpy as np

from duckdb_tpu.catalog.catalog import Catalog, ColumnDef, TableEntry
from duckdb_tpu.storage import compression as _comp
from duckdb_tpu.types import LogicalType, TypeId, decimal as make_decimal


def _type_to_json(t: LogicalType):
    if t.id is TypeId.DECIMAL:
        return {"id": "decimal", "width": t.width, "scale": t.scale}
    if t.id is TypeId.LIST:
        return {"id": "list", "child": _type_to_json(t.child)}
    if t.id is TypeId.STRUCT:
        return {"id": "struct",
                "fields": [[n, _type_to_json(ft)]
                           for n, ft in (t.fields or ())]}
    return {"id": t.id.value}


def _type_from_json(d) -> LogicalType:
    if d["id"] == "decimal":
        return make_decimal(d["width"], d["scale"])
    if d["id"] == "list":
        return LogicalType(TypeId.LIST, child=_type_from_json(d["child"]))
    if d["id"] == "struct":
        return LogicalType(TypeId.STRUCT, fields=tuple(
            (n, _type_from_json(ft)) for n, ft in d["fields"]))
    return LogicalType(TypeId(d["id"]))


def _nested_json_default(o):
    """Tagged JSON encoding for Decimal/date values inside nested-type
    dictionaries (decoded by _nested_json_decode on load)."""
    import datetime
    import decimal as pydec

    if isinstance(o, pydec.Decimal):
        return {"$dec": str(o)}
    if isinstance(o, datetime.date):
        return {"$date": o.isoformat()}
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(f"not JSON serializable: {type(o)}")


def _nested_json_decode(v):
    import datetime
    import decimal as pydec

    if isinstance(v, dict):
        if "$dec" in v:
            return pydec.Decimal(v["$dec"])
        if "$date" in v:
            return datetime.date.fromisoformat(v["$date"])
    if isinstance(v, list):
        return tuple(_nested_json_decode(x) for x in v)
    return v


_KIND = {np.dtype(np.int64): "i64", np.dtype(np.int32): "i32",
         np.dtype(np.float64): "f64", np.dtype(np.bool_): "i32",
         np.dtype(np.int16): "i32", np.dtype(np.int8): "i32",
         np.dtype(np.float32): "f64"}


class FaultInjected(RuntimeError):
    """Raised by debug_checkpoint_abort injection points (reference:
    debug_checkpoint_abort in src/common/settings.json — crash-consistency
    testing hooks)."""


def _abort_point(abort_mode: str, point: str):
    if abort_mode == point:
        raise FaultInjected(f"checkpoint aborted at {point} "
                            "(debug_checkpoint_abort)")


class _NullLock:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def checkpoint(con, path: str):
    """Write the full catalog + data to the database directory; attached
    databases checkpoint to their own directories (reference checkpoints
    each AttachedDatabase separately, src/storage/storage_manager.cpp).

    The catalog snapshot and the WAL epoch are captured atomically under
    the database commit lock: a commit landing mid-checkpoint is either
    fully inside the snapshot (its seq <= the recorded wal_seq) or fully
    outside it (seq > wal_seq, so recovery replays it) — never silently
    dropped (the reference serializes checkpoints against commits via the
    transaction manager's checkpoint lock, duck_transaction_manager.cpp)."""
    cat = con.catalog
    abort_mode = "none"
    settings = getattr(con, "settings", None)
    if settings is not None:
        abort_mode = str(settings.get("debug_checkpoint_abort", "none"))
    db = getattr(con, "_db", None)
    lock = getattr(db, "lock", None) or _NullLock()
    with lock:
        attached = dict(getattr(cat, "attached", {}))
        prefixes = tuple(a + "." for a in attached)
        tables = {k: e for k, e in cat.tables.items()
                  if not (prefixes and k.startswith(prefixes))}
        views = {k: v for k, v in cat.views.items()
                 if not (prefixes and k.startswith(prefixes))}
        schemas = sorted(cat.schemas - {"main"} - set(attached))
        sequences = {k: dict(v) for k, v in cat.sequences.items()}
        macros = [m.sql_text for m in list(cat.macros.values())
                  + list(getattr(cat, "table_macros", {}).values())
                  if m.sql_text]
        user_types = {k: dict(v) for k, v in
                      getattr(cat, "user_types", {}).items()}
        wal_seq = getattr(cat, "_wal_seq", 0)
    _write_db(path, tables, views,
              schemas=schemas,
              sequences=sequences,
              macros=macros,
              user_types=user_types,
              wal_seq=wal_seq,
              abort_mode=abort_mode)
    for alias, info in attached.items():
        if info.get("read_only") or info["path"] == ":memory:":
            continue
        checkpoint_attached(cat, alias, info["path"])


def checkpoint_attached(cat, alias: str, path: str):
    """Persist one attached database's entries (alias prefix stripped).
    Sections we don't manage for attached dbs (sequences/macros/schemas)
    are carried over from its existing catalog.json."""
    pre = alias + "."
    tables = {k[len(pre):]: e for k, e in cat.tables.items()
              if k.startswith(pre)}
    views = {k[len(pre):]: v for k, v in cat.views.items()
             if k.startswith(pre)}
    schemas, seqs, macros = [], {}, []
    cp = os.path.join(path, "catalog.json")
    if os.path.exists(cp):
        with open(cp) as f:
            old = json.load(f)
        schemas = old.get("schemas", [])
        seqs = old.get("sequences", {})
        macros = old.get("macros", [])
    _write_db(path, tables, views, schemas=schemas, sequences=seqs,
              macros=macros)


def _data_gen_dir(path: str, gen: int) -> str:
    """Directory holding generation `gen`'s table data (gen 0 = the legacy
    un-generational `data/` layout)."""
    return os.path.join(path, "data" if gen == 0 else f"data.g{gen}")


def _cleanup_stale_generations(path: str, keep_gen: int):
    """Remove data generations other than the live one (leftovers of
    aborted checkpoints, or the superseded generation after a successful
    header swap)."""
    keep = _data_gen_dir(path, keep_gen)
    candidates = _glob.glob(os.path.join(path, "data.g*"))
    if keep_gen != 0:
        candidates.append(os.path.join(path, "data"))
    for d in candidates:
        if os.path.abspath(d) != os.path.abspath(keep) and os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)


def _current_gen(path: str) -> int:
    cat_path = os.path.join(path, "catalog.json")
    if os.path.exists(cat_path):
        try:
            with open(cat_path) as f:
                return int(json.load(f).get("data_gen", 0))
        except (ValueError, OSError):
            return 0
    return 0


def _write_db(path: str, tables: dict, views: dict, schemas, sequences,
              macros, user_types=None, wal_seq: int = 0,
              abort_mode: str = "none"):
    # Checkpoint data is STAGED: each checkpoint writes a fresh
    # generation directory (data.g<N>) and the catalog.json header swap
    # atomically switches to it. A crash any time before the header swap
    # leaves the previous generation untouched, so WAL replay applies
    # against the data state the header describes — never against
    # half-written new data (the reference writes new blocks and switches
    # at the header, src/storage/single_file_block_manager.cpp
    # alternating meta headers).
    _abort_point(abort_mode, "before_data")
    old_gen = _current_gen(path)
    gen = old_gen + 1
    data_root = _data_gen_dir(path, gen)
    if os.path.isdir(data_root):  # leftover of an aborted checkpoint
        shutil.rmtree(data_root)
    os.makedirs(data_root)
    meta = {"tables": [], "views": {}, "schemas": list(schemas),
            "data_gen": gen}
    for name, entry in tables.items():
        if name.startswith("__"):
            continue  # ephemeral file/table-function tables
        tdir = os.path.join(data_root, name)
        os.makedirs(tdir, exist_ok=True)
        cols_meta = []
        for cd in entry.columns:
            vals, valid, dvals = entry.host_column(cd.name)
            base = os.path.join(tdir, cd.name)
            if cd.ltype.id in (TypeId.LIST, TypeId.STRUCT):
                import json as _json

                np.asarray(vals).astype(np.int32).tofile(base + ".i32")
                with open(base + ".dict.json", "w") as f:
                    _json.dump([list(t) for t in (dvals if dvals is not None
                                                  else [])], f,
                               default=_nested_json_default)
                kind = "listdict"
            elif cd.ltype.id is TypeId.VARCHAR:
                # dictionary persisted AS a dictionary (compression.py):
                # unique strings zstd'd once, codes FOR-bitpacked; open
                # restores both without re-uniquing
                m, payload = _comp.compress_strings(np.asarray(vals), dvals)
                enc = _comp.write_column(base, m, payload)
                kind = "z"
            else:
                arr = np.asarray(vals)
                if _KIND.get(arr.dtype, "i64") == "f64":
                    m, payload = _comp.compress_floats(arr)
                else:
                    m, payload = _comp.compress_ints(arr.astype(np.int64))
                    m["dtype"] = str(cd.ltype.np_dtype().dtype)
                enc = _comp.write_column(base, m, payload)
                kind = "z"
            if valid is not None:
                with open(base + ".validz", "wb") as f:
                    f.write(_comp.compress_validity(np.asarray(valid)))
            cm = {"name": cd.name, "kind": kind}
            if kind == "z":
                cm["enc"] = enc
            cols_meta.append(cm)
        with open(os.path.join(tdir, "meta.json"), "w") as f:
            json.dump({"rows": entry.nrows, "columns": cols_meta}, f)
        meta["tables"].append({
            "name": name,
            "columns": [{"name": cd.name, "type": _type_to_json(cd.ltype)}
                        for cd in entry.columns],
            "rows": entry.nrows,
            "constraints": [list(c) for c in entry.constraints],
            "defaults": dict(getattr(entry, "defaults", {})),
        })
    for vname, vast in views.items():
        sql_text = getattr(vast, "_sql_text", None)
        if sql_text:
            meta["views"][vname] = sql_text
    # sequences persist with their current value (reference serializes
    # SequenceCatalogEntry incl. counters, src/storage/serialization/)
    meta["sequences"] = sequences
    # macros persist as their CREATE text, re-parsed on open (the
    # reference serializes the macro parse tree the same way)
    meta["macros"] = macros
    # CREATE TYPE registry (enum dictionaries / aliases) round-trips as-is
    meta["user_types"] = user_types or {}
    # WAL epoch: entries with seq <= wal_seq are already inside this
    # checkpoint — a crash between the header replace and the truncate
    # below must not double-apply them on recovery
    meta["wal_seq"] = wal_seq
    tmp = os.path.join(path, "catalog.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    _abort_point(abort_mode, "before_header")
    os.replace(tmp, os.path.join(path, "catalog.json"))
    _abort_point(abort_mode, "before_truncate")
    # checkpoint truncates the WAL
    wal = os.path.join(path, "wal.sql")
    if os.path.exists(wal):
        os.remove(wal)
    # the previous generation is unreachable from the new header; every
    # column it held was forced resident by host_column() above, so no
    # live lazy loader points into it
    _cleanup_stale_generations(path, gen)


def wal_append(path: str, sql: str, meta=None, seq: int = None):
    """Append one logical WAL entry. `meta` pins the entry's entropy
    ({"t": micros, "seed": n}) so non-deterministic expressions
    (now()/random()/uuid()) replay to the values the original execution
    stored — the reference logs typed row images instead
    (src/storage/wal_replay.cpp:354); we log the entropy. `seq` is the
    WAL epoch counter: checkpoints record the last sequence they contain
    so a crash between header write and WAL truncate never double-applies
    (reference: WAL version checks in wal_replay.cpp)."""
    meta = dict(meta) if meta else {}
    if seq is not None:
        meta["q"] = seq
    tag = " " + json.dumps(meta) if meta else ""
    with open(os.path.join(path, "wal.sql"), "a") as f:
        f.write(sql.rstrip().rstrip(";") + f";\n--WAL_ENTRY{tag}\n")


def open_database(con, path: str):
    """Open (or create) a database directory; replay catalog + WAL."""
    os.makedirs(path, exist_ok=True)
    cat_path = os.path.join(path, "catalog.json")
    ckpt_seq = 0  # WAL epoch already folded into the checkpoint
    if os.path.exists(cat_path):
        with open(cat_path) as f:
            meta = json.load(f)
        ckpt_seq = int(meta.get("wal_seq", 0))
        data_gen = int(meta.get("data_gen", 0))
        # drop generations orphaned by a checkpoint that crashed between
        # data staging and the header swap (or between swap and cleanup)
        _cleanup_stale_generations(path, data_gen)
        data_root = _data_gen_dir(path, data_gen)
        from duckdb_tpu.storage import binary_dir
        from functools import partial

        con.catalog.schemas |= set(meta.get("schemas", []))
        for t in meta["tables"]:
            tdir = os.path.join(data_root, t["name"])
            cols = [ColumnDef(c["name"], _type_from_json(c["type"]))
                    for c in t["columns"]]
            entry = TableEntry(t["name"], cols)
            entry.nrows = t["rows"]
            entry.constraints = [tuple(c) for c in t.get("constraints", [])]
            entry.defaults = dict(t.get("defaults", {}))
            with open(os.path.join(tdir, "meta.json")) as f:
                tmeta = json.load(f)
            kinds = {c["name"]: c["kind"] for c in tmeta["columns"]}
            encs = {c["name"]: c.get("enc") for c in tmeta["columns"]}

            def loader(tdir, cname, kind, ltype, enc=None, nrows=0):
                validity = None
                vp = os.path.join(tdir, cname + ".valid")
                vpz = os.path.join(tdir, cname + ".validz")
                if os.path.exists(vpz):
                    with open(vpz, "rb") as f:
                        validity = _comp.decompress_validity(f.read(), nrows)
                elif os.path.exists(vp):
                    validity = np.fromfile(vp, dtype=np.uint8).astype(bool)
                if kind == "z":
                    out = _comp.read_column(os.path.join(tdir, cname), enc)
                    if enc["s"] == "dict":
                        codes, dvals = out
                        return codes, validity, dvals
                    if enc["s"] == "f64z":
                        return out, validity, None
                    dt = np.dtype(enc.get("dtype", "int64"))
                    return out.astype(dt), validity, None
                if kind == "str":
                    values = binary_dir.read_string_column(tdir, cname)
                    codes, uniq = binary_dir.dict_encode(values)
                    return codes, validity, uniq
                if kind == "listdict":
                    import json as _json

                    from duckdb_tpu.planner.functions_nested import obj_array

                    codes = binary_dir.read_numeric_column(tdir, cname, "i32")
                    with open(os.path.join(tdir, cname + ".dict.json")) as f:
                        entries = [tuple(_nested_json_decode(v) for v in x)
                                   for x in _json.load(f)]
                    return codes, validity, obj_array(entries)
                if kind == "f64":
                    v = np.fromfile(os.path.join(tdir, cname + ".f64"),
                                    dtype=np.float64)
                else:
                    v = binary_dir.read_numeric_column(tdir, cname, kind)
                return v.astype(ltype.np_dtype), validity, None

            for cd in cols:
                entry.set_lazy_column(
                    cd.name, partial(loader, tdir, cd.name, kinds[cd.name],
                                     cd.ltype, encs.get(cd.name),
                                     entry.nrows))
            con.catalog.create_table(entry, or_replace=True)
        for vname, vsql in meta.get("views", {}).items():
            from duckdb_tpu.sql.parser import Parser

            stmts = Parser(vsql).parse_statements()
            for st in stmts:
                if hasattr(st, "query") and st.query is not None:
                    st.query._sql_text = vsql
                    con.catalog.views[vname] = st.query
                    break
                if type(st).__name__ == "SelectStatement":
                    con.catalog.views[vname] = st
                    break
        if meta.get("sequences"):
            con.catalog.sequences = {k: dict(v)
                                     for k, v in meta["sequences"].items()}
            from duckdb_tpu.planner import functions_ext as _fx

            _fx.ACTIVE_SEQUENCES = con.catalog.sequences
        for msql in meta.get("macros", []):
            con._execute_statement_nowal(msql)
        if meta.get("user_types"):
            con.catalog.user_types = {k: dict(v) for k, v in
                                      meta["user_types"].items()}
    # crash recovery: replay WAL statements with their pinned entropy
    wal = os.path.join(path, "wal.sql")
    if os.path.exists(wal):
        buf: list = []
        entries = []
        for line in open(wal).read().splitlines():
            if line.startswith("--WAL_ENTRY"):
                meta_s = line[len("--WAL_ENTRY"):].strip()
                meta = json.loads(meta_s) if meta_s else None
                stmt = "\n".join(buf).strip()
                buf = []
                if stmt:
                    entries.append((stmt, meta))
            else:
                buf.append(line)
        tail = "\n".join(buf).strip()
        if tail:  # torn final entry (crash mid-append): still replay it
            entries.append((tail, None))
        import random as _random

        from duckdb_tpu.planner import functions_ext as _fx

        max_seq = ckpt_seq
        for stmt, meta in entries:
            seq = (meta or {}).get("q")
            if seq is not None:
                max_seq = max(max_seq, int(seq))
                if int(seq) <= ckpt_seq:
                    # already inside the checkpoint (crash hit between the
                    # catalog header replace and the WAL truncate)
                    continue
            if meta:
                _fx.REPLAY_TIME_MICROS = meta.get("t")
                if meta.get("seed") is not None:
                    _fx.REPLAY_RNG = _random.Random(meta["seed"])
            try:
                con._execute_statement_nowal(stmt)
            finally:
                _fx.REPLAY_TIME_MICROS = None
                _fx.REPLAY_RNG = None
        con.catalog._wal_seq = max_seq
    else:
        con.catalog._wal_seq = ckpt_seq
