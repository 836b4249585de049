"""Parquet-backed lake table with Iceberg-style ACID snapshot commits.

No Iceberg runtime jar ships in this container, so the engine provides
its own table format with the same guarantees the north rule needs,
implemented Spark-first:

- **Snapshot isolation / atomic commit**: every commit writes an
  immutable ``_meta/snap-<v>.json`` manifest (schema + file list +
  lineage) and atomically flips the ``_meta/_current`` pointer via
  ``os.replace``. Readers always see a complete snapshot.
- **Field-id schema evolution**: data files store columns named
  ``f_<field_id>`` (plus system columns), so *rename* is pure metadata
  (Iceberg's trick — no file rewrite, no drop+add ambiguity) and
  *widen* is a read-side cast; files written before a widen are read
  with their recorded per-file schema and unioned (Iceberg per-file
  schema semantics).
- **Bucket layout**: rows are hash-bucketed on the merge key
  (``pmod(xxhash64(key), n_buckets)`` ~ Iceberg ``bucket(N, url)``).
  MERGE rewrites only the buckets the source batch touches and re-links
  unchanged files — copy-on-write with partition pruning, which is what
  keeps a 10^10-row table mergeable: work is O(touched buckets), not
  O(table).
- **LSN-guarded MERGE**: upsert keeps the max-``lsn`` row per key;
  deletes become tombstones that *retain* their lsn so a late (lower-lsn)
  update arriving after a delete cannot resurrect the row — the
  correctness gap the reference's unconditional ``$set`` upsert has
  (trials_extractor/storage/mongodb_storage.py:229-231, noted in
  SURVEY.md §2.9).
- **Exactly-once**: commits record ``batch_id``; re-applying an
  already-committed batch is a metadata no-op, so foreachBatch retries
  and checkpoint replays converge to the identical snapshot. Tracking
  is bounded (Delta ``txnAppId``/``txnVersion``-style): numeric-suffixed
  ids ("epoch-17", "replay-3") keep one high-water mark per prefix —
  the Structured Streaming contract delivers epochs in order, so
  n <= hwm means already applied — plus a bounded recent-id set for
  arbitrary ids. Snapshot metadata therefore does NOT grow O(commits).
- **Bounded snapshot metadata**: file entries live in immutable
  per-commit manifest files; the snapshot carries only a
  bucket -> manifest pointer map (O(n_buckets), fixed) and per-commit
  lineage goes to a sidecar (``_meta/lineage/``), so each commit writes
  O(touched buckets) new metadata instead of rewriting the full file
  list and the whole history. Bucket-pruned reads load only the
  manifests of the buckets they touch.

On a cluster with a real Iceberg catalog the same apply code path can
emit ``MERGE INTO`` SQL instead (see ``cdc/apply.py``); this class is
the self-contained sandbox/production-parquet fallback.

Single-writer assumption (one streaming query owns the table), which is
exactly the Structured Streaming deployment model.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SYS_LSN = "_lsn"
SYS_DELETED = "_deleted"
SYS_BUCKET = "_bucket"

_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "boolean": T.BooleanType(),
}


def _spark_type(name: str) -> T.DataType:
    return _TYPES[name]


class CommitConflict(Exception):
    """Another writer committed this snapshot version first. The table
    is single-writer by design (one streaming query per checkpoint —
    the Structured Streaming model); this fires when two jobs are
    accidentally pointed at the same table root. Detection, not
    serialization: the loser fails loudly BEFORE clobbering committed
    metadata, instead of last-writer-wins silently corrupting the
    snapshot chain. Recovery: stop the duplicate job; a legitimate
    retry re-reads the table state and commits on top of the winner.

    The ONE sanctioned concurrent-writer pair is delta-mode ingest
    beside maintenance (the Iceberg rewrite_data_files deployment
    pattern), race-free in BOTH orders: a ``compact()`` that loses
    the race to delta-merge commits rebases its metadata on top of
    them (``_rebase_rewrite_base``), and a delta ``merge()`` that
    loses to a maintenance commit re-commits its layer on top of the
    winner (``_rebase_delta_merge_base``). Everything else — rival
    merges, COW losers, layout changes under a rewrite — still fails
    loudly."""


class CorrectionFenceCollision(Exception):
    """An incoming CDC batch carries an event whose LSN equals a
    lake-side correction's fence LSN *for a key that correction
    touched*. ``update_where`` mints its corrected rows at
    ``max(applied lsn) + 1`` — an LSN the upstream log had not yet
    emitted — so a later source event assigned exactly that LSN for
    the same key would tie with the correction under the
    max-``(lsn, deleted)`` winner rule with two DIFFERENT payloads:
    genuinely ambiguous, and the one case the engine refuses to
    resolve silently. The apply path (``cdc/apply.py``) trips this
    before the merge runs; the batch is untouched and the stream can
    be resumed after the operator either re-runs the correction on
    top of the new event or drops the event. Events at the fence LSN
    for keys the correction did NOT touch apply normally — the guard
    semi-joins against the correction commit's own rows, so there are
    no false halts."""


def _fences_entry(parent: dict, add_lsn: int | None,
                  version: int) -> dict:
    """``correction_fences`` snapshot entry: ``[lsn, commit_version]``
    pairs carried forward from the parent, plus this commit's new
    fence when it is a lake-side correction. Maintenance commits copy
    the snapshot dict wholesale, so only the two merge constructors
    need this. Bounded by the number of ``update_where`` calls ever
    made — corrections are rare operator actions, not a per-batch
    path."""
    fences = [list(p) for p in parent.get("correction_fences", [])]
    if add_lsn is not None:
        fences.append([int(add_lsn), int(version)])
    return {"correction_fences": fences} if fences else {}


# bounded optimistic-concurrency retries for the rebasing commit path
# (compaction vs a live ingest stream); each retry re-reads the
# current snapshot, so exhausting them means the table is committing
# faster than a metadata rebase can keep up — rerun the compaction
_COMMIT_RETRIES = 5

# column types whose parquet min/max stats the manifest records (the
# orderable primitives; binary payloads and nested types never get
# stats — they are not skippable predicates)
_STAT_TYPES = {
    "int", "integer", "short", "smallint", "long", "bigint",
    "float", "double", "real", "boolean", "string", "timestamp", "date",
}
# longer string stats are dropped, not truncated: a truncated max
# would be a LOWER bound, and skipping on it could drop matching files
_STAT_MAX_STR = 64


def _stat_encode(v):
    """JSON-safe, order-preserving encoding of a parquet stat value.
    Timestamps -> epoch micros (UTC), dates -> epoch days, strings
    as-is (UTF-8 byte order == code-point order, so Python string
    comparison matches parquet's ordering). Returns None for values
    that cannot be encoded safely — the caller drops that column's
    stat for the file, which only disables skipping, never
    correctness."""
    import datetime

    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        return v if len(v) <= _STAT_MAX_STR else None
    return None


def _parquet_footer(path: str, stat_cols: set[str]) -> tuple[int, dict]:
    """Row count + per-column ``[min, max]`` from the parquet footer —
    ONE driver-side metadata read per written file, no Spark job (the
    same read that already supplied row counts). A column's stat is
    recorded only if EVERY row group reports min/max for it; a missing
    or unencodable row-group stat poisons the whole file's entry for
    that column (conservative: no stat == never skipped)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if name not in stat_cols or name in bad:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                continue
            lo, hi = _stat_encode(st.min), _stat_encode(st.max)
            if lo is None or hi is None:
                bad.add(name)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    stats = {n: [mins[n], maxs[n]] for n in mins if n not in bad}
    return md.num_rows, stats


# string rank uses a 6-byte (48-bit) big-endian window so the value
# stays exactly representable in a double's 53-bit mantissa — a wider
# window would silently stop being order-preserving at the low bits
_ZORDER_STR_PREFIX = 6


def _lcp_bytes(a: str, b: str) -> int:
    """Byte length of the longest common prefix of two strings' UTF-8
    encodings. Lexicographic invariant: every value between min and
    max shares min/max's common prefix, so skipping it before ranking
    loses no order information — it recovers the bytes that actually
    discriminate (web urls all open with ``https://...``; a constant
    window there would collapse the whole dimension to one rank)."""
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    n = 0
    for x, y in zip(ab, bb):
        if x != y:
            break
        n += 1
    return n


def _zorder_str_rank_value(s: str, offset: int) -> float:
    """Driver-side twin of the string branch of
    ``_zorder_rank_expr`` — byte-exact (same UTF-8 slice, same
    right-zero-padding, same big-endian integer), so the dimension
    bounds can be derived from the already-aggregated min/max strings
    instead of a second Spark job over the rank column."""
    window = s.encode("utf-8")[offset:offset + _ZORDER_STR_PREFIX]
    window = window.ljust(_ZORDER_STR_PREFIX, b"\x00")
    return float(int.from_bytes(window, "big"))


def _zorder_rank_expr(phys_name: str, dtype: str, str_offset: int = 0):
    """Order-preserving DOUBLE projection of an orderable column, the
    per-dimension input to the Z-order (Morton) key. Strings map to a
    UTF-8 6-byte big-endian window starting after the dimension's
    common prefix (``str_offset`` bytes, from ``_lcp_bytes`` of the
    global min/max — lexicographic order of the windows preserved);
    timestamps/dates to epoch seconds; numerics cast. Pure JVM
    expressions — no Python in the rewrite path."""
    c = F.col(phys_name)
    if dtype == "string":
        hexpad = F.rpad(
            F.hex(F.substring(c.cast("binary"), str_offset + 1,
                              _ZORDER_STR_PREFIX)),
            _ZORDER_STR_PREFIX * 2, "0")
        return F.conv(hexpad, 16, 10).cast("double")
    if dtype == "date":
        return c.cast("timestamp").cast("double")
    if dtype == "boolean":
        return c.cast("int").cast("double")
    return c.cast("double")  # numerics and timestamps


def _zorder_key(norms: list) -> "F.Column":
    """Interleave the bits of pre-normalized per-dimension bucket
    indexes (longs in ``[0, 2^bits)``) into one Morton key:
    ``z = OR_{i,d} ((v_d >> i & 1) << (i*D + d))``. Built as a static
    JVM expression tree (``bits × D`` shift/mask terms), entirely
    inside whole-stage codegen."""
    dims = len(norms)
    bits = min(16, 63 // dims)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, n in enumerate(norms):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(n, i).bitwiseAND(F.lit(1)),
                    i * dims + d))
    return z


def _zorder_norm(rank, lo: float, hi: float, dims: int):
    """Scale one dimension's rank double into its ``2^bits``-bucket
    index (nulls to bucket 0 — they cluster at the curve's origin).
    Degenerate dimensions (single value, or bounds unavailable)
    contribute a constant 0, which only wastes their interleaved bits."""
    bits = min(16, 63 // dims)
    nb = 1 << bits
    if lo is None or hi is None or not (hi > lo):
        return F.lit(0).cast("long")
    n = F.floor((rank - F.lit(float(lo)))
                / F.lit(float(hi) - float(lo)) * nb).cast("long")
    n = F.least(F.lit(nb - 1).cast("long"),
                F.greatest(F.lit(0).cast("long"), n))
    return F.coalesce(n, F.lit(0).cast("long"))


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, "_meta")
        self.data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------ meta

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        fields: list[dict],
        key_field: str,
        n_buckets: int = 16,
        key_bloom_bits: int | None = None,
    ) -> "LakeTable":
        """fields: [{"id": int, "name": str, "type": str}, ...]

        ``key_bloom_bits``: record a per-file key bloom filter of this
        many bits in the manifest at every write (see
        ``_attach_key_blooms``). Point lookups then skip bloom-missing
        files — including DELTA LAYERS, which min/max stats must not
        skip — so a lookup on a layer-accreting streaming table stays
        O(files-holding-the-key) between compactions. Size at >=10
        bits per row-per-file for ~1% false positives (a false
        positive only costs reading one extra file). Off by default:
        each merge pays one extra narrow Spark job to build the blooms."""
        if key_bloom_bits is not None and (
                key_bloom_bits < 64 or key_bloom_bits % 64):
            raise ValueError("key_bloom_bits must be a multiple of 64")
        table = cls(spark, root)
        os.makedirs(table.meta_dir, exist_ok=True)
        os.makedirs(table.lineage_dir, exist_ok=True)
        os.makedirs(table.data_dir, exist_ok=True)
        snap = {
            "version": 0,
            "parent": None,
            "schema": {"fields": fields, "key": key_field},
            "n_buckets": n_buckets,
            **({"key_bloom_bits": key_bloom_bits}
               if key_bloom_bits else {}),
            "manifests": {},       # bucket (str) -> manifest file path
            "batch_hwm": {},       # batch-id prefix -> max numeric suffix
            "applied_recent": [],  # bounded set for non-numeric ids
            "committed_at": time.time(),
        }
        table._write_snapshot(snap)
        return table

    def _snap_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{version:08d}.json")

    def _write_manifest(self, version: int,
                        by_bucket: dict[str, list[dict]]) -> str:
        """Write a per-commit manifest at a UNIQUE path and return it.

        Manifests are path-referenced everywhere — snapshot manifest
        lists, and the change feed resolves a merge commit's own
        manifest from its lineage entry (``commit_manifest``) — so no
        two writers can ever compute the same target filename: rivals
        racing on one version number each write their own file and
        exactly one wins the snapshot's create-if-absent commit; the
        loser's manifest is inert residue, never a silent cross-link
        into the winner's snapshot (the failure mode a shared
        ``manifest-<version>.json`` name admits during the
        write-then-commit window). The embedded version is the
        writer's target AT WRITE TIME — provisional until the
        snapshot commits; a rebased commit re-points the same file at
        a higher version (see ``merge``/``compact``)."""
        path = os.path.join(
            self.meta_dir,
            f"manifest-{version:08d}-{uuid.uuid4().hex[:12]}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "files": by_bucket}, f, indent=1)
        os.replace(tmp, path)
        return path

    def _manifest_path(self, version: int) -> str:
        """Legacy shared-name manifest location — READ fallback only
        (tables written before manifests went unique-path); no writer
        targets it anymore."""
        return os.path.join(self.meta_dir, f"manifest-{version:08d}.json")

    @property
    def lineage_dir(self) -> str:
        return os.path.join(self.meta_dir, "lineage")

    def _write_snapshot(self, snap: dict) -> None:
        """Commit = atomically CREATE snap-<version>.json (write the
        full content to a temp file, then hard-link it into place —
        link fails with EEXIST if the version already exists). Two
        writers racing to commit the same next version therefore
        cannot silently overwrite each other: exactly one wins, the
        other gets CommitConflict and must re-read the table state and
        retry on top of the winner (Iceberg optimistic-concurrency
        contract). Version 0 (create) keeps plain replace semantics —
        re-creating over an existing table root is the caller's
        explicit act, not a race."""
        path = self._snap_path(snap["version"])
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        if snap["version"] == 0:
            os.replace(tmp, path)
        else:
            try:
                os.link(tmp, path)
            except FileExistsError:
                raise CommitConflict(
                    f"version {snap['version']} was committed by a "
                    f"concurrent writer — re-read the table state and "
                    f"retry on top of it") from None
            finally:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        cur_tmp = os.path.join(self.meta_dir, f"_current.tmp-{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(snap["version"]))
        os.replace(cur_tmp, os.path.join(self.meta_dir, "_current"))

    def current_version(self) -> int:
        with open(os.path.join(self.meta_dir, "_current")) as f:
            v = int(f.read().strip())
        # _current is a HINT (Iceberg version-hint.text analog): a
        # crash between the snapshot link and the pointer update
        # leaves it one behind, and with create-if-absent commits a
        # stale pointer would wedge the next commit in a conflict it
        # can never win. The snapshot files are the truth: roll
        # forward to the newest committed version.
        while os.path.exists(self._snap_path(v + 1)):
            v += 1
        return v

    def snapshot(self, version: int | str | None = None) -> dict:
        if version is None:
            version = self.current_version()
        elif isinstance(version, str):
            version = self._resolve_ref(version)
        with open(self._snap_path(version)) as f:
            return json.load(f)

    def version_as_of(self, ts) -> int:
        """Resolve a wall-clock instant to the snapshot that was
        current then (Iceberg ``FOR SYSTEM_TIME AS OF`` / Delta
        ``timestampAsOf`` analog): the HIGHEST existing version whose
        ``committed_at`` <= ``ts``. Commit timestamps are stamped at
        snapshot-link time, so they are monotone in version and the
        lookup is exact, not heuristic. ``ts`` is epoch seconds or a
        ``datetime`` (naive = local time, tz-aware respected —
        ``datetime.timestamp()`` semantics).

        Raises when the table didn't exist at ``ts``. Resolution
        itself always stays exact under retention —
        ``expire_snapshots`` drops old snapshots' *data files* but
        keeps every snapshot JSON — though READING the resolved
        version can still fail at scan time if its files were
        expired, same as ``read(version=old)``. Driver-side metadata
        only."""
        if hasattr(ts, "timestamp"):
            ts = ts.timestamp()
        ts = float(ts)
        best = -1
        for fn in os.listdir(self.meta_dir):
            if not (fn.startswith("snap-") and fn.endswith(".json")):
                continue
            with open(os.path.join(self.meta_dir, fn)) as f:
                snap = json.load(f)
            if snap["committed_at"] <= ts and snap["version"] > best:
                best = snap["version"]
        if best < 0:
            raise ValueError(
                f"no snapshot existed at ts={ts} (table created later)")
        # meta-dir holes (a partial copy/manual cleanup — never this
        # format's own retention, which keeps all snapshot JSONs): if
        # ``best``'s immediate successor's JSON is gone its commit
        # time is unknowable — it may have been <= ts, making ``best``
        # stale at that instant. Refuse rather than silently hand back
        # an earlier state.
        if (best < self.current_version()
                and not os.path.exists(self._snap_path(best + 1))):
            raise ValueError(
                f"snapshot v{best + 1} (the successor of the resolved "
                f"v{best}) is missing from the metadata dir — whether "
                f"v{best} was still current at ts={ts} is unknowable; "
                f"time-travel by version or tag instead")
        return best

    # ---------------------------------------------------------- refs

    _REF_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")

    @property
    def refs_dir(self) -> str:
        return os.path.join(self.meta_dir, "refs")

    def _tag_path(self, name: str) -> str:
        if not self._REF_NAME_RE.match(name):
            raise ValueError(
                f"invalid tag name {name!r} (want [A-Za-z0-9._-], "
                f"letter/digit first, <=64 chars)")
        return os.path.join(self.refs_dir, f"tag-{name}.json")

    def tag(self, name: str, version: int | None = None) -> dict:
        """Create an immutable named ref to a snapshot (Iceberg tag
        analog — `ALTER TABLE ... CREATE TAG`). Tags pin their
        snapshot against ``expire_snapshots`` retention: a tagged
        version stays readable until the tag is dropped, however far
        the retention window moves past it (audit / reproducibility
        pins: 'the exact table state model X was trained on').

        Creation is atomic create-if-absent, same hard-link contract
        as snapshot commits — re-tagging an existing name raises
        instead of silently moving the pin (delete_tag first)."""
        if version is None:
            version = self.current_version()
        if not os.path.exists(self._snap_path(version)):
            raise ValueError(f"no snapshot v{version} to tag")
        os.makedirs(self.refs_dir, exist_ok=True)
        path = self._tag_path(name)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"name": name, "version": version,
                       "created_at": time.time()}, f, indent=1)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise ValueError(
                f"tag {name!r} already exists (tags are immutable — "
                f"delete_tag it first to move the pin)") from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return {"name": name, "version": version}

    def tags(self) -> dict[str, int]:
        """All tags, name -> pinned snapshot version."""
        if not os.path.isdir(self.refs_dir):
            return {}
        out: dict[str, int] = {}
        for fn in sorted(os.listdir(self.refs_dir)):
            if fn.startswith("tag-") and fn.endswith(".json"):
                with open(os.path.join(self.refs_dir, fn)) as f:
                    rec = json.load(f)
                out[rec["name"]] = rec["version"]
        return out

    def delete_tag(self, name: str) -> None:
        path = self._tag_path(name)
        if not os.path.exists(path):
            raise ValueError(f"no such tag {name!r}")
        os.remove(path)

    def _resolve_ref(self, name: str) -> int:
        tags = self.tags()
        if name not in tags:
            raise ValueError(f"no such tag {name!r} (have {sorted(tags)})")
        return tags[name]

    # ------------------------------------------------------- branches
    #
    # Iceberg-style BRANCHES (mutable named refs with their own commit
    # chain) on top of the same snapshot format. A branch is a
    # metadata-only fork: its snap-0 re-references the fork point's
    # manifests (no data copies), its data files land in the SHARED
    # ``data/`` directory (every write path in this format is
    # copy-on-write — no file is ever mutated — so sharing is safe),
    # and only its metadata chain diverges, under
    # ``_meta/branches/<name>/``. The deployment shape this serves is
    # the audit branch (Iceberg's ``spark.wap.branch`` pattern): run
    # the ingest stream or a backfill against a branch, audit the
    # RESULT STATE across any number of commits — merges, compaction,
    # schema evolution — then publish atomically with
    # ``fast_forward`` or discard with ``drop_branch``. Compared to
    # the single-commit WAP staging below (write-audit-publish one
    # batch), a branch is the multi-commit generalization.
    #
    # ``fast_forward`` is a squash publish: ONE create-if-absent
    # commit on main whose state is the branch head's (manifests
    # adopted by hard link, schema and the exactly-once ledger carried
    # over — re-delivering branch-applied epochs to main is a no-op),
    # and whose commit manifest is the NET file diff vs the fork base,
    # so the change feed / mirrors / incremental views downstream of
    # main read O(branch changes), never O(table). Publishing is
    # all-or-nothing by construction (the engine's snapshot commit is
    # a single atomic link), which is why the branch's commits are
    # squashed rather than replayed one-by-one — a multi-snapshot
    # adoption could be half-published by a crash or a lost race.
    #
    # Reference analog: none — the reference's store has no isolation
    # between a bulk load and its readers at all (every upsert is
    # immediately visible, trials_extractor/storage/
    # mongodb_storage.py); this is the audited-publish replacement.

    @property
    def branches_dir(self) -> str:
        return os.path.join(self.meta_dir, "branches")

    def _branch_ref_path(self, name: str) -> str:
        if not self._REF_NAME_RE.match(name):
            raise ValueError(
                f"invalid branch name {name!r} (want [A-Za-z0-9._-], "
                f"letter/digit first, <=64 chars)")
        return os.path.join(self.refs_dir, f"branch-{name}.json")

    def _require_main(self, op: str) -> None:
        if getattr(self, "branch_name", None) is not None:
            raise ValueError(
                f"{op} must run on the main table, not on branch "
                f"{self.branch_name!r} (branches share the main "
                f"table's data directory; one level of branching)")

    def create_branch(self, name: str, version: int | None = None) -> dict:
        """Fork a branch at ``version`` (default: current head).
        Metadata-only — the branch's snap-0 re-references the fork
        snapshot's manifests; no data moves. The fork copy carries the
        schema, bucket layout AND the exactly-once ledger
        (``batch_hwm``/``applied_recent``), so a stream pointed at the
        branch resumes exactly where the main table's state left off.
        The ref file is linked create-if-absent LAST, so a crashed
        create leaves an unlisted directory (inert residue), never a
        half-registered branch."""
        self._require_main("create_branch")
        ref = self._branch_ref_path(name)
        if version is None:
            version = self.current_version()
        snap = self.snapshot(version)
        bdir = os.path.join(self.branches_dir, name)
        if os.path.exists(ref) or os.path.isdir(bdir):
            raise ValueError(f"branch {name!r} already exists")
        os.makedirs(bdir, exist_ok=True)
        fork = {k: v for k, v in snap.items() if k != "lineage"}
        fork["version"] = 0
        fork["parent"] = None
        fork["fork"] = {"version": version}
        fork["committed_at"] = time.time()
        self.branch(name, _check=False)._write_snapshot(fork)
        os.makedirs(self.refs_dir, exist_ok=True)
        tmp = ref + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"name": name, "version": version,
                       "created_at": time.time()}, f, indent=1)
        try:
            os.link(tmp, ref)
        except FileExistsError:
            raise ValueError(
                f"branch {name!r} already exists") from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return {"name": name, "forked_at": version}

    def branches(self) -> dict[str, dict]:
        """All branches, name -> {forked_at, head} (head = number of
        unpublished commits on the branch)."""
        if not os.path.isdir(self.refs_dir):
            return {}
        out: dict[str, dict] = {}
        for fn in sorted(os.listdir(self.refs_dir)):
            if fn.startswith("branch-") and fn.endswith(".json"):
                with open(os.path.join(self.refs_dir, fn)) as f:
                    rec = json.load(f)
                out[rec["name"]] = {
                    "forked_at": rec["version"],
                    "head": self.branch(
                        rec["name"], _check=False).current_version(),
                }
        return out

    def branch(self, name: str, _check: bool = True) -> "LakeTable":
        """The branch as a LakeTable: same engine, same data
        directory, its own metadata chain — every operation (merge,
        read, changes, compact, schema evolution, WAP staging, time
        travel) works against it unchanged. Versions are
        branch-local: 0 is the fork state. Maintenance that sweeps
        the SHARED data directory (``remove_orphans``,
        ``expire_snapshots``) is refused on a branch — run it on main,
        which counts branch-referenced files as live."""
        self._require_main("branch")
        ref = self._branch_ref_path(name)  # validates the name
        if _check and not os.path.exists(ref):
            raise ValueError(
                f"no such branch {name!r} "
                f"(have {sorted(self.branches())})")
        bt = LakeTable(self.spark, self.root)
        bt.meta_dir = os.path.join(self.branches_dir, name)
        bt.branch_name = name  # data_dir stays the shared root/data
        return bt

    def drop_branch(self, name: str, force: bool = False) -> dict:
        """Discard a branch. Refuses while it holds unpublished
        commits unless ``force`` — their exclusive data files become
        unreferenced and main's ``remove_orphans`` reclaims them on
        the normal maintenance cadence."""
        self._require_main("drop_branch")
        ref = self._branch_ref_path(name)
        bdir = os.path.join(self.branches_dir, name)
        if not (os.path.exists(ref) or os.path.isdir(bdir)):
            raise ValueError(f"no such branch {name!r}")
        head = 0
        if os.path.isdir(bdir):
            head = self.branch(name, _check=False).current_version()
        if head > 0 and not force:
            raise ValueError(
                f"branch {name!r} has {head} unpublished commit(s) — "
                f"fast_forward to publish them, or "
                f"drop_branch(force=True) to discard")
        try:
            os.remove(ref)
        except OSError:
            pass
        shutil.rmtree(bdir, ignore_errors=True)
        return {"dropped": name, "discarded_commits": head}

    def fast_forward(self, name: str) -> dict:
        """Publish a branch onto main as ONE atomic commit (Iceberg
        ``fast_forward`` analog, squash semantics): main's next
        snapshot IS the branch head's state — manifests adopted by
        hard link into main's metadata dir, schema/bucket layout and
        the exactly-once ledger carried over (epochs the branch
        absorbed are no-ops if re-delivered to main). Requires main's
        LOGICAL state to still be the fork point's: an intervening
        ingest-class commit (merge/fast_forward), rollback, or
        rebucket raises CommitConflict — re-branch on the new state
        (the ``publish_staged`` ancestry guard). LAYOUT-ONLY movement
        — compaction commits (snapshot expiry and orphan GC don't
        commit at all) — REBASES instead of conflicting: the
        out-of-band maintenance job beside an open audit branch is
        sanctioned, a compaction doesn't invalidate the audit, and
        retention kept the fork-era files alive because the branch
        references them (untouched buckets re-point at those files;
        the maintenance cadence re-compacts after the publish). A
        schema evolution on main conflicts too — adopting the head's
        fork-era schema would silently undo it.

        The published commit's manifest is the NET file diff vs the
        fork base, so downstream incremental consumers (``changes``/
        ``changes_window``, mirrors, materialized views) fold the
        branch's work as one O(branch-changes) commit. Two honest
        feed caveats travel in the lineage: a branch that REBUCKETED
        publishes with bucket pruning disabled for the feed's
        pre-state read (bucket ids changed), and a branch whose
        history contains a ROLLBACK publishes feed-opaque — a revert
        can move keys to OLDER lsns, which a strictly-greater diff
        cannot represent; consumers resync from a full read (the same
        contract as a rollback directly on main).

        The branch is dropped after publishing (its chain was
        branch-local-numbered; the squashed commit carries a compact
        ``branch_history`` audit trail in its lineage)."""
        self._require_main("fast_forward")
        bt = self.branch(name)
        with open(self._branch_ref_path(name)) as f:
            ref = json.load(f)
        base_version = ref["version"]
        head = bt.current_version()
        if bt.staged():
            raise ValueError(
                f"branch {name!r} has staged WAP commits — publish or "
                f"abort them on the branch before fast_forward")
        if head == 0:
            self.drop_branch(name)
            return {"published": name, "commits": 0, "noop": True,
                    "version": self.current_version()}
        cur = self.current_version()
        if cur != base_version:
            # Rebase over LAYOUT-ONLY main movement (the same
            # whitelist doctrine as _rebase_delta_merge_base): the
            # out-of-band maintenance job beside an open audit branch
            # is a sanctioned deployment, and a compaction changes
            # layout, not logical state — publishing the branch head
            # on top of it is still exactly "the audited state"
            # (untouched buckets re-point at the fork-era files,
            # which retention kept alive BECAUSE the branch
            # references them; max-LSN reads make the layouts
            # row-identical, and the maintenance cadence re-compacts).
            # A rival MERGE/fast_forward absorbed events the audit
            # never saw; a rebucket renumbered the buckets the branch
            # head's manifests are keyed by; a rollback changed state;
            # a schema evolution on main would be silently UNDONE by
            # adopting the head's fork-era schema. Only commits on the
            # explicit layout-only whitelist rebase; anything else —
            # including unknown types from a newer writer — conflicts.
            _REBASABLE = ("compaction",)
            for v in range(base_version + 1, cur + 1):
                lin = self._lineage_entry(v) or {}
                t = lin.get("type")
                if t not in _REBASABLE:
                    raise CommitConflict(
                        f"branch {name!r} forked at v{base_version} "
                        f"but the table is at v{cur} and v{v} is a "
                        f"{t or 'unknown'} commit — its commits (and "
                        f"any audit over them) assumed that exact "
                        f"base; re-create the branch on the current "
                        f"state")
            if self.snapshot()["n_buckets"] != \
                    self.snapshot(base_version)["n_buckets"]:
                raise CommitConflict(
                    f"bucket layout changed under branch {name!r} — "
                    f"re-create the branch on the current state")
        head_snap = bt.snapshot(head)
        base_snap = self.snapshot(base_version)
        version = cur + 1

        branch_history: list[dict] = []
        rolled_back = rebucketed = False
        for v in range(1, head + 1):
            lin = bt._lineage_entry(v) or {}
            t = lin.get("type")
            rolled_back |= t == "rollback"
            rebucketed |= t == "rebucket"
            branch_history.append({"branch_version": v, "type": t})
        rebucketed |= head_snap["n_buckets"] != base_snap["n_buckets"]

        # net file diff vs the fork base = the published commit's
        # manifest (written into MAIN's meta dir; the branch dir goes
        # away). Entries keep their stats/blooms — skipping survives
        # the publish.
        base_paths = {e["path"] for e in self.files(base_snap)}
        net: dict[str, list[dict]] = {}
        for b in head_snap["manifests"]:
            es = [e for e in self.files(head_snap, {int(b)})
                  if e["path"] not in base_paths]
            if es:
                net[b] = es
        man_path = self._write_manifest(version, net)

        # adopt branch-dir manifests into main's meta dir (unique
        # paths — a lost race leaves only inert residue)
        adopt: dict[str, str] = {}
        new_manifests: dict[str, list[str]] = {}
        bprefix = bt.meta_dir + os.sep
        for b, lst in head_snap["manifests"].items():
            out = []
            for p in lst:
                if p.startswith(bprefix):
                    if p not in adopt:
                        np = os.path.join(
                            self.meta_dir,
                            f"manifest-{version:08d}-"
                            f"{uuid.uuid4().hex[:12]}.json")
                        os.link(p, np)
                        adopt[p] = np
                    out.append(adopt[p])
                else:
                    out.append(p)
            new_manifests[b] = out

        lin = {
            "type": "fast_forward",
            "branch": name,
            "forked_at": base_version,
            "branch_commits": head,
            "branch_history": branch_history,
            "commit_manifest": man_path,
            "touched_buckets": sorted(int(b) for b in net),
            **({"rebased_over": cur - base_version}
               if cur != base_version else {}),
            **({"feed_opaque": True} if rolled_back else {}),
            **({"rebucketed": True} if rebucketed else {}),
        }
        snap2 = dict(head_snap)
        snap2["version"] = version
        snap2["parent"] = cur
        snap2["manifests"] = new_manifests
        snap2["committed_at"] = time.time()
        snap2.pop("fork", None)
        snap2["lineage"] = lin
        self._write_snapshot(snap2)  # CommitConflict on a lost race
        self._append_lineage(version, lin)
        self.drop_branch(name, force=True)
        return {"published": name, "version": version, "commits": head,
                "net_files": sum(len(v) for v in net.values())}

    def _branch_file_paths(self) -> set[str]:
        """Data files referenced by ANY snapshot of ANY branch
        (including unlisted crash residue under ``branches/``, and
        branches' own staged WAP commits) — counted as live by main's
        ``expire_snapshots`` / ``remove_orphans``."""
        out: set[str] = set()
        if not os.path.isdir(self.branches_dir):
            return out
        for name in os.listdir(self.branches_dir):
            bt = self.branch(name, _check=False)
            if not os.path.isdir(bt.meta_dir):
                continue
            out |= bt._staged_file_paths()
            for fn in os.listdir(bt.meta_dir):
                if fn.startswith("snap-") and fn.endswith(".json"):
                    with open(os.path.join(bt.meta_dir, fn)) as f:
                        snap = json.load(f)
                    for e in self.files(snap):
                        out.add(e["path"])
        return out

    # --------------------------------------------- batch idempotence

    _BATCH_ID_RE = re.compile(r"^(.*?)(\d+)$")
    _RECENT_CAP = 64

    def is_applied(self, batch_id: str, snap: dict | None = None) -> bool:
        """Has this batch already committed? Numeric-suffixed ids check
        the per-prefix high-water mark (streaming epochs / replay chunks
        arrive in order — the Delta txnVersion contract); other ids
        check the bounded recent set."""
        snap = snap or self.snapshot()
        if batch_id in snap["applied_recent"]:
            return True
        m = self._BATCH_ID_RE.match(batch_id)
        if m:
            prefix, n = m.group(1), int(m.group(2))
            return n <= snap["batch_hwm"].get(prefix, -1)
        return False

    def _record_applied(self, snap: dict, batch_id: str) -> None:
        m = self._BATCH_ID_RE.match(batch_id)
        if m:
            prefix, n = m.group(1), int(m.group(2))
            snap["batch_hwm"][prefix] = max(snap["batch_hwm"].get(prefix, -1), n)
        recent = snap["applied_recent"] + [batch_id]
        snap["applied_recent"] = recent[-self._RECENT_CAP:]

    # ------------------------------------------------------- lineage

    def _append_lineage(self, version: int, entry: dict) -> None:
        """Per-commit lineage sidecar — O(1) per commit instead of
        rewriting the whole history into every snapshot.

        Ordering contract: callers write the SNAPSHOT first (the
        atomic create-if-absent link that decides the commit race) and
        the sidecar second. The authoritative copy of the entry rides
        INSIDE the snapshot (``snap["lineage"]``), so a crash between
        the two writes loses nothing and a lineage file can never
        describe a version that a competing commit actually won — the
        sidecar is a listing convenience, reconciled from snapshots by
        ``_lineage_entry``."""
        os.makedirs(self.lineage_dir, exist_ok=True)
        path = os.path.join(self.lineage_dir, f"lin-{version:08d}.json")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=1)
        os.replace(tmp, path)

    def _lineage_entry(self, version: int) -> dict | None:
        """The single lineage entry for a commit, or None (v1 CREATE
        and snapshot-expiry write no entry). The snapshot's embedded
        copy is authoritative (committed atomically with the version);
        the sidecar covers tables written before embedding existed."""
        snap_path = self._snap_path(version)
        if os.path.exists(snap_path):
            with open(snap_path) as f:
                snap = json.load(f)
            if "lineage" in snap:
                return snap["lineage"]
        path = os.path.join(self.lineage_dir, f"lin-{version:08d}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def lineage(self) -> list[dict]:
        """All lineage entries in commit order. Resolved per version
        through ``_lineage_entry`` (snapshot-embedded copy first), so a
        crash between a commit and its sidecar write cannot drop the
        committed entry from the listing; sidecar-only entries (from
        snapshots later removed by hand) still appear."""
        versions: set[int] = set()
        if os.path.isdir(self.lineage_dir):
            for fn in os.listdir(self.lineage_dir):
                if fn.startswith("lin-") and fn.endswith(".json"):
                    versions.add(int(fn[4:-5]))
        for fn in os.listdir(self.meta_dir):
            if fn.startswith("snap-") and fn.endswith(".json"):
                versions.add(int(fn[5:-5]))
        out = []
        for v in sorted(versions):
            e = self._lineage_entry(v)
            if e is not None:
                out.append(e)
        return out

    # ---------------------------------------------------------- files

    def files(self, snap: dict | None = None,
              buckets: set[int] | None = None) -> list[dict]:
        """File entries for the given buckets (all if None), resolved
        through the per-commit manifests. A bucket maps to an ordered
        LIST of manifest paths — one layer per merge-on-read delta
        commit since its last base rewrite. Bucket pruning prunes the
        metadata reads too: only manifests owning wanted buckets load."""
        snap = snap or self.snapshot()
        manifests = snap["manifests"]
        wanted = (
            set(manifests)
            if buckets is None
            else {str(b) for b in buckets if str(b) in manifests}
        )
        paths_needed: set[str] = set()
        for b in wanted:
            paths_needed.update(manifests[b])
        loaded: dict[str, dict] = {}
        for path in sorted(paths_needed):
            with open(path) as f:
                loaded[path] = json.load(f)
        out: list[dict] = []
        for b in sorted(wanted, key=int):
            for path in manifests[b]:
                out.extend(loaded[path]["files"].get(b, []))
        return out

    # ---------------------------------------------------------- schema

    def fields(self, snap: dict | None = None) -> list[dict]:
        snap = snap or self.snapshot()
        return snap["schema"]["fields"]

    def key_field(self, snap: dict | None = None) -> str:
        snap = snap or self.snapshot()
        return snap["schema"]["key"]

    def _full_struct(self, fields: list[dict]) -> T.StructType:
        cols = [T.StructField(f["name"], _spark_type(f["type"])) for f in fields]
        cols += [
            T.StructField(SYS_LSN, T.LongType()),
            T.StructField(SYS_DELETED, T.BooleanType()),
        ]
        return T.StructType(cols)

    def registry_version(self, snap: dict | None = None,
                         registry: dict | None = None) -> int:
        """Highest registry schema_ver already applied (monotonic guard:
        a late-arriving batch with an older schema_ver must not evolve
        the table backwards).

        When the snapshot predates registry_ver stamping, infer it as
        the highest registry version whose field list matches the
        snapshot's — defaulting to 1 would let an older batch re-apply
        a backwards rename or crash on a widen reversal."""
        snap = snap or self.snapshot()
        ver = snap["schema"].get("registry_ver")
        if ver is not None:
            return ver
        from clinical_trials_etl_spark.cdc import registry as reg

        registry = registry or reg.PAGES_REGISTRY
        mine = {(f["id"], f["name"], f["type"]) for f in self.fields(snap)}
        for v in sorted(registry, reverse=True):
            if {(f["id"], f["name"], f["type"]) for f in registry[v]} <= mine:
                return v
        return 1

    def evolve(
        self, new_fields: list[dict], note: str, registry_ver: int | None = None
    ) -> None:
        """Commit a schema-only snapshot (add / rename / widen already
        validated by cdc/registry.py)."""
        snap = self.snapshot()
        snap2 = dict(snap)
        snap2["version"] = snap["version"] + 1
        snap2["parent"] = snap["version"]
        snap2["schema"] = {
            "fields": new_fields,
            "key": snap["schema"]["key"],
            "registry_ver": (
                registry_ver
                if registry_ver is not None
                else self.registry_version(snap)
            ),
        }
        lin = {"type": "schema-evolution", "note": note}
        snap2["lineage"] = lin
        self._write_snapshot(snap2)
        self._append_lineage(snap2["version"], lin)

    # ------------------------------------------------------------ read

    def _read_files(
        self,
        snap: dict,
        buckets: set[int] | None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Read snapshot files (grouped by their write-time physical
        schema so widened columns coexist), project to the *current*
        schema by field-id, cast as needed.

        ``columns``: restrict the projection to these data fields (the
        system columns always ride along). This is the column-pruning
        seam for merge-on-read reads: the winner aggregation packs its
        payload into ONE struct, which blocks Catalyst from pruning
        through it — so the pruning must happen here, upstream of the
        reconciliation (plan-gated in tests/test_plans.py)."""
        fields = self.fields(snap)
        if columns is not None:
            missing = set(columns) - {f["name"] for f in fields}
            if missing:
                raise ValueError(f"unknown columns: {sorted(missing)}")
            fields = [f for f in fields if f["name"] in set(columns)]
        return self._read_entries(fields, self.files(snap, buckets))

    def _read_entries(
        self, fields: list[dict], files: list[dict]
    ) -> DataFrame:
        """Read an explicit file-entry list, projecting each
        phys-signature group onto ``fields`` by field-id (the shared
        body of snapshot reads and the change-feed's per-commit
        manifest reads)."""
        out_struct = self._full_struct(fields)
        if not files:
            return self.spark.createDataFrame([], out_struct)

        by_sig: dict[str, list[dict]] = {}
        for f in files:
            by_sig.setdefault(json.dumps(f["phys"], sort_keys=True), []).append(f)

        parts = []
        for sig, group in by_sig.items():
            phys = json.loads(sig)  # {"f_<id>": type, ...}
            paths = [g["path"] for g in group]
            # explicit schema from the snapshot's recorded physical
            # signature: skips Spark's eager footer-based inference at
            # DataFrame creation (a driver-side read per call that
            # grows with file count; the signature IS the authority on
            # what these files contain — name-matched by the reader)
            phys_struct = T.StructType(
                [T.StructField(n, _spark_type(t))
                 for n, t in sorted(phys.items())]
                + [T.StructField(SYS_LSN, T.LongType()),
                   T.StructField(SYS_DELETED, T.BooleanType())]
            )
            df = self.spark.read.schema(phys_struct).parquet(*paths)
            proj = []
            for fld in fields:
                phys_name = f"f_{fld['id']}"
                if phys_name in phys:
                    proj.append(
                        F.col(phys_name)
                        .cast(_spark_type(fld["type"]))
                        .alias(fld["name"])
                    )
                else:  # column added after these files were written
                    proj.append(
                        F.lit(None).cast(_spark_type(fld["type"])).alias(fld["name"])
                    )
            proj += [F.col(SYS_LSN), F.col(SYS_DELETED)]
            parts.append(df.select(*proj))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @staticmethod
    def _winner_per_key(df: DataFrame, key: str) -> DataFrame:
        """Max-(lsn, deleted) row per key — the merge-on-read
        reconciliation AND the merge's winner rule (one algebraic
        max_by aggregation with map-side partial aggregation, not a
        row_number window: see merge())."""
        payload = F.struct(*[F.col(c) for c in df.columns])
        return (
            df.groupBy(key)
            .agg(
                F.max_by(
                    payload, F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))
                ).alias("_w")
            )
            .select("_w.*")
        )

    def _read_reconciled(
        self,
        snap: dict,
        buckets: set[int] | None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Union of base + delta layers, reconciled to one row per key
        when any delta layer is present in the selection (merge-on-read).
        Base-only selections skip the aggregation entirely — COW data
        is already one-row-per-key at rest.

        ``columns``: data-field subset to read (the key is added if
        absent — the reconciliation groups by it)."""
        key = self.key_field(snap)
        cols = None
        if columns is not None:
            cols = list(dict.fromkeys([*columns, key]))
        entries = self.files(snap, buckets)
        df = self._read_files(snap, buckets, cols)
        if any(e.get("delta") for e in entries):
            df = self._winner_per_key(df, key)
        return df

    def _read_skipping(
        self,
        snap: dict,
        columns: list[str] | None,
        col: str,
        lo,
        hi,
        buckets: set[int] | None = None,
        entries: list[dict] | None = None,
    ) -> DataFrame:
        """Reconciled read that SKIPS files whose manifest ``[min,max]``
        for ``col`` is disjoint from ``[lo, hi]`` — before any scan
        task is planned (Iceberg manifest-stats pruning analog).

        Skipping is only sound where dropping a whole file cannot
        change winner resolution: in buckets with no delta layers,
        data is one-row-per-key at rest, so a skipped file's rows
        would all have been filtered anyway. A bucket with delta
        layers reads ALL its files and reconciles — a skipped delta
        file could hold the max-LSN winner for a key whose superseded
        (and in-range) row would then wrongly resurrect. The row-level
        BETWEEN filter is applied by the caller in both cases, post
        reconciliation — stats only skip, they never substitute for
        the filter.

        ``entries``: explicit file-entry list to plan from instead of
        ``files(snap, buckets)`` — the seam lookup() uses after its
        bloom pre-filter (which, being key-exact, may soundly drop
        delta files this method must keep for RANGE predicates)."""
        key = self.key_field(snap)
        fields = self.fields(snap)
        col_id = next(
            (f["id"] for f in fields if f["name"] == col), None)
        if col_id is None:
            raise ValueError(f"unknown between column {col!r}")
        phys_name = f"f_{col_id}"
        # a bound of None means open-ended (no constraint on that
        # side); a bound that fails to ENCODE disables skipping on
        # that side but the row filter still applies it
        lo_e = _stat_encode(lo) if lo is not None else None
        hi_e = _stat_encode(hi) if hi is not None else None
        if columns is not None:
            cols = list(dict.fromkeys([*columns, key]))
            missing = set(cols) - {f["name"] for f in fields}
            if missing:
                raise ValueError(f"unknown columns: {sorted(missing)}")
            fields = [f for f in fields if f["name"] in set(cols)]

        by_bucket: dict[int, list[dict]] = {}
        for e in (self.files(snap, buckets)
                  if entries is None else entries):
            by_bucket.setdefault(e["bucket"], []).append(e)
        base: list[dict] = []
        layered: list[dict] = []
        for group in by_bucket.values():
            if any(e.get("delta") for e in group):
                layered += group
                continue
            for e in group:
                st = (e.get("stats") or {}).get(phys_name)
                try:
                    disjoint = st is not None and (
                        (lo_e is not None and st[1] < lo_e)
                        or (hi_e is not None and st[0] > hi_e))
                except TypeError:  # bound/stat type mismatch: keep
                    disjoint = False
                if not disjoint:
                    base.append(e)
        parts: list[DataFrame] = []
        if base or not layered:
            parts.append(self._read_entries(fields, base))
        if layered:
            parts.append(self._winner_per_key(
                self._read_entries(fields, layered), key))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        version: int | str | None = None,
        columns: list[str] | None = None,
        between: tuple | None = None,
        as_of=None,
    ) -> DataFrame:
        """Live rows at a snapshot (delta layers reconciled, tombstones
        filtered, system cols off).

        ``columns``: project to these fields AT THE SCAN. For COW
        tables a plain ``.select`` after read() prunes identically
        (Catalyst pushes it to the parquet scan), but on a table with
        delta layers the winner aggregation's payload struct blocks
        that pushdown — pass ``columns`` to keep a narrow read narrow
        at any table width (at design scale: reading one field of a
        page row must not scan the html blobs).

        ``between``: ``(col, lo, hi)`` — inclusive range filter on a
        data column; either bound may be None for an open end
        ('everything since T'). Evaluated against the per-file min/max stats the
        manifest records at write time so stat-disjoint files are
        skipped at the manifest (see ``_read_skipping``). Pair with
        ``compact(sort_by=col, rows_per_file=...)`` for range-clustered
        files that make the skipping effective: a time-window read of
        a year-long pages table then touches O(window) files.

        ``version`` also accepts a tag name (read-at-ref);
        ``as_of`` (epoch seconds or datetime, exclusive with
        ``version``) time-travels to the snapshot current at that
        wall-clock instant via ``version_as_of``."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass version OR as_of, not both")
            version = self.version_as_of(as_of)
        return self._read_snap(self.snapshot(version), columns, between)

    def _read_snap(
        self,
        snap: dict,
        columns: list[str] | None = None,
        between: tuple | None = None,
    ) -> DataFrame:
        if between is None:
            df = self._read_reconciled(snap, None, columns)
        else:
            col, lo, hi = between
            if lo is None and hi is None:
                raise ValueError("between needs at least one bound")
            cols = (None if columns is None
                    else list(dict.fromkeys([*columns, col])))
            df = self._read_skipping(snap, cols, col, lo, hi)
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
        out = df.filter(~F.col(SYS_DELETED)).drop(SYS_LSN, SYS_DELETED)
        if columns is not None:
            out = out.select(*columns)  # drop a key added only for dedup
        return out

    def read_raw(self, buckets: set[int] | None = None) -> DataFrame:
        """Rows incl. tombstones + system cols, reconciled to one row
        per key (merge input)."""
        return self._read_reconciled(self.snapshot(), buckets)

    def lookup(self, key_value) -> DataFrame:
        """Keyed point lookup with bucket pruning (S14 on the lake
        table): hashes the key to its single bucket, reads only that
        bucket's manifest + files — O(1) metadata and one file group
        touched regardless of table size (Iceberg bucket-partition
        pruning analog).

        Within the bucket, the manifest's per-file key min/max stats
        skip stat-disjoint files (same machinery and same safety rule
        as ``read(between=...)``: base-only buckets skip, layered
        buckets reconcile everything). A bucket compacted with
        ``compact(sort_by=<key>, rows_per_file=k)`` therefore serves a
        point lookup from ONE of its k-row files — sorted compaction
        on the key buys lookups the same O(window) behavior it buys
        time windows. Keys longer than the recorded-stat cap simply
        read the whole bucket (stats absent, never wrong).

        On a table created with ``key_bloom_bits``, manifest blooms
        pre-filter the bucket's files — INCLUDING delta layers, which
        the min/max rule must keep: a bloom miss is key-exact ('this
        key is definitely not in this file'), so dropping the file
        cannot change this key's winner reconciliation. That keeps
        point lookups O(files-holding-the-key) on a layer-accreting
        streaming table even between compactions. An absent bloom or
        a phys-type mismatch (widened key) keeps the file — skipping
        is an optimization, never an oracle."""
        snap = self.snapshot()
        key = self.key_field(snap)
        m_bits = snap.get("key_bloom_bits")
        key_type = next(f["type"] for f in self.fields(snap)
                        if f["name"] == key)
        fid = next(f["id"] for f in self.fields(snap)
                   if f["name"] == key)
        lit_k = F.lit(key_value).cast(_spark_type(key_type))
        sel = [self.bucket_expr(lit_k).alias("b")] + (
            [] if not m_bits else
            [self._bloom_probe_expr(lit_k, j, m_bits).alias(f"p{j}")
             for j in range(self._BLOOM_K)]
        )
        row = self.spark.range(1).select(*sel).collect()[0]
        bucket = row["b"]
        entries = None
        if m_bits:
            probes = [row[f"p{j}"] for j in range(self._BLOOM_K)]
            phys_key = f"f_{fid}"

            def _may_contain(e: dict) -> bool:
                bloom = e.get("key_bloom")
                if bloom is None or e["phys"].get(phys_key) != key_type:
                    return True  # no/unusable bloom: never skip
                return all(
                    (bloom[p // 64] >> (p % 64)) & 1 for p in probes)

            entries = [e for e in self.files(snap, {bucket})
                       if _may_contain(e)]
        df = self._read_skipping(
            snap, None, key, key_value, key_value, buckets={bucket},
            entries=entries)
        return (
            df.filter(F.col(key) == key_value)
            .filter(~F.col(SYS_DELETED))
            .drop(SYS_LSN, SYS_DELETED)
        )

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        net: bool = True,
        columns: list[str] | None = None,
        pre_images: bool = False,
    ) -> DataFrame:
        """Change data feed (Delta CDF / Iceberg incremental-scan
        analog): the net post-image row changes between two snapshots,
        so a downstream consumer reads O(changes) — never re-scans the
        table. Output = the data columns at ``to_version``'s schema
        plus ``_lsn`` (long), ``_change_type`` ('upsert' | 'delete')
        and ``_commit_version`` (long). Applying the feed to a copy of
        the ``from_version`` state in commit order (last write per key
        wins, 'delete' removes) reproduces the ``to_version`` state
        exactly; maintenance commits (compaction, rebucket, schema
        evolution) emit no rows because they change no logical state.
        A ``rollback`` commit in the range fails fast instead — a
        revert can undo any number of prior commits at once and is not
        incrementally foldable; downstream consumers resync from a
        full read.

        Cost model per merge commit in the range (the design-scale
        story):

        - the commit's own manifest lists exactly the files it wrote —
          a delta-mode commit's layer files ARE the change rows
          (O(batch) read); a COW commit's rewritten buckets carry
          changed + carried-over rows and need a diff;
        - the diff's pre-state is read COLUMN-PRUNED to
          (key, lsn, deleted) over only the commit's touched buckets —
          the pre-image html/text payloads never leave the parquet
          scan. A row changed iff its (lsn, deleted) winner struct
          strictly beats the pre-state's (lsn monotonicity of the
          merge winner rule), so no payload compare is needed.

        ``columns`` prunes the feed to a field subset AT THE SCAN (the
        key always rides along) — same seam as ``read(columns=...)``
        and for the same reason: the delta path's winner aggregation
        blocks Catalyst from pruning through its payload struct.

        ``net=False`` skips the pre-state diff for delta-mode commits
        and emits their layer rows as-is — the cheapest possible feed
        (zero pre-reads), but it may include rows that lost to the
        base state (late, lower-lsn arrivals). Consumers of the raw
        feed must apply with the engine's max-(lsn, deleted) rule
        rather than last-write-wins; net=True feeds are safe for both.

        ``pre_images=True`` switches to Delta-CDF image semantics: an
        update emits BOTH its old row (``_change_type =
        'update_preimage'``, values and ``_lsn`` from the pre-state)
        and its new row (``'update_postimage'``); a first write emits
        ``'insert'``; a delete emits one ``'delete'`` row carrying the
        OLD values (a tombstone for a key that was not live emits
        nothing). Because each commit's pre-image equals the previous
        commit's post-image, signed contributions telescope across a
        multi-commit window — the property incremental aggregate
        maintenance needs (cdc/ivm.py): sum(+post, -pre) over any
        window equals the aggregate delta between its endpoint
        snapshots. Costs one wide pre-state read per commit (prune it
        with ``columns`` — aggregates only need their grouping/value
        fields). Requires ``net=True``.

        The feed is readable as far back as snapshot retention:
        ``expire_snapshots`` removes old versions' files, after which
        ``changes`` over that range raises (same window as time
        travel). Reference analog: consumers of the reference's store
        re-poll full collections (trials_extractor/storage/
        mongodb_storage.py) — there is no incremental surface; this is
        the Spark-native replacement."""
        current = self.current_version()
        if to_version is None:
            to_version = current
        if not (0 <= from_version <= to_version <= current):
            raise ValueError(
                f"invalid change range {from_version}..{to_version} "
                f"(current version {current})")
        if pre_images and not net:
            raise ValueError("pre_images requires the net feed "
                             "(raw layer rows have no pre-state)")

        to_snap = self.snapshot(to_version)
        fields = self.fields(to_snap)
        key = self.key_field(to_snap)
        if columns is not None:
            # prune at the scan, same seam as read(columns=...): the
            # delta path's winner aggregation blocks Catalyst pruning
            wanted = set(columns) | {key}
            missing = wanted - {f["name"] for f in fields}
            if missing:
                raise ValueError(f"unknown columns: {sorted(missing)}")
            fields = [f for f in fields if f["name"] in wanted]
        key_fld = [f for f in fields if f["name"] == key]

        def _out(df: DataFrame, version: int) -> DataFrame:
            return df.select(
                *[F.col(f["name"]) for f in fields],
                F.col(SYS_LSN).alias("_lsn"),
                F.when(F.col(SYS_DELETED), F.lit("delete"))
                .otherwise(F.lit("upsert")).alias("_change_type"),
                F.lit(version).cast("long").alias("_commit_version"),
            )

        parts: list[DataFrame] = []
        for v in range(from_version + 1, to_version + 1):
            lin = self._lineage_entry(v)
            if lin is not None and (lin.get("type") == "rollback"
                                    or lin.get("feed_opaque")):
                # a revert is not incrementally foldable (it can undo
                # any number of prior commits at once) — fail fast
                # rather than silently emit nothing for a commit that
                # DID change logical state; consumers resync from a
                # full read (cdc/mirror.py / cdc/ivm.py: recreate).
                # Same for a fast_forward publishing a branch whose
                # history contains a rollback (feed_opaque).
                raise ValueError(
                    f"change range {from_version}..{to_version} "
                    f"crosses a rollback at v{v} — resync downstream "
                    f"state from a full read instead")
            if lin is None or lin.get("type") not in (
                    "merge", "fast_forward"):
                continue  # maintenance/evolution: no logical change
            with open(lin.get("commit_manifest")
                      or self._manifest_path(v)) as f:
                man = json.load(f)
            entries = [e for group in man["files"].values() for e in group]
            if not entries:
                continue
            gone = sum(1 for e in entries if not os.path.exists(e["path"]))
            if gone:
                raise ValueError(
                    f"change feed for commit v{v} is no longer readable: "
                    f"{gone} of its data files were removed by "
                    f"expire_snapshots — start from a retained version")
            new = self._read_entries(fields, entries)
            all_delta = all(e.get("delta") for e in entries)
            if all_delta:
                # layer rows are the change candidates; defensively
                # collapse to one row per key (apply pre-dedups, so
                # this is a batch-sized no-op aggregation)
                new = self._winner_per_key(new, key)
                if not net:
                    parts.append(_out(new, v))
                    continue
            elif lin.get("type") == "fast_forward":
                # a fast_forward's net manifest can mix COW rewrites
                # and delta layers from different branch commits — a
                # key may appear in several files; collapse to its
                # winner before the diff
                new = self._winner_per_key(new, key)
            # diff vs the pre-state winner of the touched buckets:
            # strictly-greater (lsn, deleted) == the row changed
            touched = set(
                lin.get("touched_buckets")
                or {e["bucket"] for e in entries})
            # a fast_forward of a branch that REBUCKETED records its
            # touched buckets in the NEW layout — pruning the OLD
            # pre-state by them is unsound; read it unpruned
            pre_entries = self.files(
                self.snapshot(v - 1),
                None if lin.get("rebucketed") else touched)

            def _only_new_keys(pre: DataFrame) -> DataFrame:
                """For a delta commit, the change candidates are its
                O(batch) layer keys — semi-join the pre-state down to
                them BEFORE the winner aggregation, so the agg input
                shrinks from O(touched-bucket rows) to O(batch). AQE
                broadcasts the small key side. A COW commit's rewritten
                buckets carry every key they own, so the filter would
                keep everything — skip it there."""
                if not all_delta:
                    return pre
                return pre.join(new.select(key), key, "left_semi")

            if pre_images:
                # wide pre-state: the requested value columns ride
                # along so pre-image rows can be emitted
                pre_w = self._winner_per_key(
                    _only_new_keys(self._read_entries(fields, pre_entries)),
                    key,
                ).select(
                    F.col(key),
                    *[F.col(f["name"]).alias(f"_pre_{f['name']}")
                      for f in fields if f["name"] != key],
                    F.col(SYS_LSN).alias("_pre_lsn"),
                    F.col(SYS_DELETED).alias("_pre_del"),
                )
            else:
                # slim pre-state: only (key, lsn, deleted) cross the
                # scan — no payload compare is needed for the diff
                pre_w = (
                    _only_new_keys(self._read_entries(key_fld, pre_entries))
                    .groupBy(key)
                    .agg(F.max(F.struct(SYS_LSN, SYS_DELETED))
                         .alias("_w"))
                    .select(
                        F.col(key),
                        F.col(f"_w.{SYS_LSN}").alias("_pre_lsn"),
                        F.col(f"_w.{SYS_DELETED}").alias("_pre_del"),
                    )
                )
            beats_pre = (
                F.col("_pre_lsn").isNull()
                | (F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))
                   > F.struct(F.col("_pre_lsn"), F.col("_pre_del")))
            )
            changed = new.join(pre_w, key, "left").where(beats_pre)
            if not pre_images:
                parts.append(
                    _out(changed.drop("_pre_lsn", "_pre_del"), v))
                continue
            pre_live = (F.col("_pre_lsn").isNotNull()
                        & ~F.col("_pre_del"))
            ver = F.lit(v).cast("long").alias("_commit_version")
            # post-side rows: the new live values
            parts.append(
                changed.where(~F.col(SYS_DELETED)).select(
                    *[F.col(f["name"]) for f in fields],
                    F.col(SYS_LSN).alias("_lsn"),
                    F.when(pre_live, F.lit("update_postimage"))
                    .otherwise(F.lit("insert")).alias("_change_type"),
                    ver,
                ))
            # pre-side rows: the superseded live values (a tombstone
            # for a key that was not live emits nothing)
            parts.append(
                changed.where(pre_live).select(
                    F.col(key),
                    *[F.col(f"_pre_{f['name']}").alias(f["name"])
                      for f in fields if f["name"] != key],
                    F.col("_pre_lsn").alias("_lsn"),
                    F.when(F.col(SYS_DELETED), F.lit("delete"))
                    .otherwise(F.lit("update_preimage"))
                    .alias("_change_type"),
                    ver,
                ))

        if not parts:
            schema = T.StructType(
                [T.StructField(f["name"], _spark_type(f["type"]))
                 for f in fields]
                + [T.StructField("_lsn", T.LongType()),
                   T.StructField("_change_type", T.StringType()),
                   T.StructField("_commit_version", T.LongType())]
            )
            return self.spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def changes_window(
        self,
        from_version: int,
        to_version: int | None = None,
        columns: list[str] | None = None,
        pre_images: bool = False,
    ) -> DataFrame:
        """The NET change feed of the whole window in ONE two-sided
        diff instead of ``changes()``'s per-commit loop: winner-per-key
        at ``from_version`` vs winner-per-key at ``to_version``,
        restricted to the keys the window's merge commits touched.

        Because per-commit pre-images equal the previous commit's
        post-images, intermediate images telescope away — the signed
        per-group contributions of this feed are IDENTICAL to the
        per-commit feed's (pinned in tests/test_change_feed.py), but a
        K-commit window costs 2 touched-bucket reads + one candidate
        read instead of K pre-state reads and K Spark-plan arms. This
        is the consumer a refresh cadence wants (cdc/ivm.py refreshes
        every K epochs; its per-refresh fixed cost was dominated by
        the K feed arms — VERDICT r4 #7). Consumers that need
        per-commit granularity (``_commit_version`` per change) keep
        using ``changes()``; here every row carries
        ``_commit_version = to_version``.

        Output schema and ``pre_images``/``columns`` semantics match
        ``changes()``; a key whose end-state winner equals its
        start-state winner emits nothing. Intermediate churn (a key
        inserted AND deleted inside the window) emits no pre/post
        image pair — in net mode it surfaces as a single ``delete``
        row (an idempotent no-op for a consumer that never saw the
        key), so downstream folds land on the same state either way
        (pinned in tests/test_change_feed.py). Raises on
        rollbacks in range and on windows whose commit manifests lost
        files to ``expire_snapshots`` (same contracts as
        ``changes()``)."""
        current = self.current_version()
        if to_version is None:
            to_version = current
        if not (0 <= from_version <= to_version <= current):
            raise ValueError(
                f"invalid change range {from_version}..{to_version} "
                f"(current version {current})")

        to_snap = self.snapshot(to_version)
        fields = self.fields(to_snap)
        key = self.key_field(to_snap)
        if columns is not None:
            wanted = set(columns) | {key}
            missing = wanted - {f["name"] for f in fields}
            if missing:
                raise ValueError(f"unknown columns: {sorted(missing)}")
            fields = [f for f in fields if f["name"] in wanted]
        key_fld = [f for f in fields if f["name"] == key]

        empty_schema = T.StructType(
            [T.StructField(f["name"], _spark_type(f["type"]))
             for f in fields]
            + [T.StructField("_lsn", T.LongType()),
               T.StructField("_change_type", T.StringType()),
               T.StructField("_commit_version", T.LongType())]
        )

        touched: set[int] = set()
        cand_entries: list[dict] = []
        stable_buckets = True
        for v in range(from_version + 1, to_version + 1):
            lin = self._lineage_entry(v)
            if lin is not None and (lin.get("type") == "rollback"
                                    or lin.get("feed_opaque")):
                raise ValueError(
                    f"change range {from_version}..{to_version} "
                    f"crosses a rollback at v{v} — resync downstream "
                    f"state from a full read instead")
            if lin is not None and (lin.get("type") == "rebucket"
                                    or lin.get("rebucketed")):
                # bucket NUMBERS recorded by commits before the
                # rebucket don't address the same keys afterwards —
                # bucket pruning is unsound across the boundary, so
                # read all buckets (candidate-key semi-joins still
                # bound the diff); same for a fast_forward publishing
                # a branch that rebucketed
                stable_buckets = False
            if lin is None or lin.get("type") not in (
                    "merge", "fast_forward"):
                continue
            with open(lin.get("commit_manifest")
                      or self._manifest_path(v)) as f:
                man = json.load(f)
            entries = [e for group in man["files"].values()
                       for e in group]
            gone = sum(1 for e in entries
                       if not os.path.exists(e["path"]))
            if gone:
                raise ValueError(
                    f"change feed for commit v{v} is no longer "
                    f"readable: {gone} of its data files were removed "
                    f"by expire_snapshots — start from a retained "
                    f"version")
            cand_entries += entries
            touched |= set(
                lin.get("touched_buckets")
                or {e["bucket"] for e in entries})
        if not cand_entries:
            return self.spark.createDataFrame([], empty_schema)

        buckets_arg = touched if stable_buckets else None
        pre_entries = self.files(self.snapshot(from_version), buckets_arg)
        gone = sum(1 for e in pre_entries
                   if not os.path.exists(e["path"]))
        if gone:
            raise ValueError(
                f"pre-state v{from_version} is no longer readable: "
                f"{gone} files removed by expire_snapshots — start "
                f"from a retained version")

        # candidate keys: a key-only scan of the window commits' own
        # files (O(sum of batch sizes) for delta commits; a COW
        # commit's rewritten buckets contribute carried keys too —
        # harmless supersets that diff to nothing)
        cand_keys = self._read_entries(key_fld, cand_entries).select(key)
        post_w = self._winner_per_key(
            self._read_entries(fields, self.files(to_snap, buckets_arg))
            .join(cand_keys, key, "left_semi"),
            key,
        )
        pre_w = self._winner_per_key(
            self._read_entries(fields, pre_entries)
            .join(cand_keys, key, "left_semi"),
            key,
        ).select(
            F.col(key),
            *[F.col(f["name"]).alias(f"_pre_{f['name']}")
              for f in fields if f["name"] != key],
            F.col(SYS_LSN).alias("_pre_lsn"),
            F.col(SYS_DELETED).alias("_pre_del"),
        )
        beats_pre = (
            F.col("_pre_lsn").isNull()
            | (F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))
               > F.struct(F.col("_pre_lsn"), F.col("_pre_del")))
        )
        changed = post_w.join(pre_w, key, "left").where(beats_pre)
        ver = F.lit(to_version).cast("long").alias("_commit_version")
        if not pre_images:
            return changed.select(
                *[F.col(f["name"]) for f in fields],
                F.col(SYS_LSN).alias("_lsn"),
                F.when(F.col(SYS_DELETED), F.lit("delete"))
                .otherwise(F.lit("upsert")).alias("_change_type"),
                ver,
            )
        pre_live = (F.col("_pre_lsn").isNotNull() & ~F.col("_pre_del"))
        post = changed.where(~F.col(SYS_DELETED)).select(
            *[F.col(f["name"]) for f in fields],
            F.col(SYS_LSN).alias("_lsn"),
            F.when(pre_live, F.lit("update_postimage"))
            .otherwise(F.lit("insert")).alias("_change_type"),
            ver,
        )
        pre = changed.where(pre_live).select(
            F.col(key),
            *[F.col(f"_pre_{f['name']}").alias(f["name"])
              for f in fields if f["name"] != key],
            F.col("_pre_lsn").alias("_lsn"),
            F.when(F.col(SYS_DELETED), F.lit("delete"))
            .otherwise(F.lit("update_preimage")).alias("_change_type"),
            ver,
        )
        return post.unionByName(pre)

    # ----------------------------------------------------- maintenance

    def compact(self, max_files_per_bucket: int = 1,
                sort_by: str | list[str] | None = None,
                rows_per_file: int | None = None,
                zorder_by: list[str] | None = None,
                drop_tombstones_below_lsn: int | None = None) -> dict:
        """Small-file compaction (Iceberg rewrite_data_files analog):
        rewrite every bucket holding more than ``max_files_per_bucket``
        files into one file per bucket, commit as a new snapshot. Data
        is unchanged (tombstones retained — compaction must not lose
        the delete guard); only file layout and metadata shrink.
        Needed at design scale: each ``mode="delta"`` streaming commit
        adds a delta layer per touched bucket, so buckets accrete
        O(commits-since-compaction) small files whose read-side
        reconciliation would otherwise dominate scan costs — compaction
        is the amortized half of the merge-on-read bargain.

        ``sort_by``: cluster rows within each bucket by this column —
        or lexicographically by a LIST of columns (Iceberg SORT ORDER
        analog; the leading column gets full range clustering, later
        columns cluster within leading-value ties) — during the
        rewrite, and cap output files at ``rows_per_file`` rows so
        each bucket splits into contiguous sorted ranges. Every
        written file's min/max for the leading column then covers a
        narrow slice, which is what makes the manifest stats recorded
        at write time effective:
        ``read(between=(sort_by, lo, hi))`` skips the disjoint files
        at the manifest, before any scan task is planned. At design
        scale this is the 'query yesterday's pages out of a year-long
        table' path — time-windowed reads touch O(window) files, not
        O(table). With ``sort_by`` set, ALL buckets rewrite (range
        clustering is the point, not just file count).

        ``zorder_by``: cluster by the Morton (Z-order) interleaving of
        two-or-more orderable columns instead (Iceberg
        ``rewrite_data_files`` Z-order strategy analog; Morton 1966).
        A lexicographic multi-column sort range-clusters only its
        LEADING column — a window read on the second column still
        plans every file. Z-ordering interleaves the dimensions'
        bits, so each written file's min/max box is tight on EVERY
        Z dimension (~F^(1/D) of the range per file across F files)
        and ``read(between=...)`` skips on whichever dimension the
        query constrains. Dimension normalization bounds come from one
        min/max aggregation over the rewrite input (2 scalars per
        dimension to the driver); the key itself is a static JVM
        shift/mask expression tree — no Python in the rewrite path.
        Layout-only: the read side is untouched, the existing manifest
        stats + skipping machinery does the pruning.

        ``drop_tombstones_below_lsn``: ALSO drop tombstone rows whose
        lsn is strictly below this value during the rewrite — the
        Kafka compacted-topic ``delete.retention.ms`` analog, and the
        final step of full key erasure after ``delete_where`` (a
        retained tombstone necessarily keeps its key — that is what
        the late-arrival guard matches on). The operator asserts the
        source's watermark has passed the threshold: an event below
        it can no longer arrive, so the guard those tombstones
        provided is vacuous and dropping them cannot change any
        future reconciliation. Live rows are NEVER dropped regardless
        of lsn. Buckets are pruned by manifest lsn stats (a bucket
        whose every file's min lsn is at/above the threshold holds no
        droppable tombstone).

        Concurrency: compaction is the one op sanctioned to run beside
        the ingest stream. Losing the snapshot-commit race to
        delta-merge commits does not discard the rewrite — the commit
        REBASES, adopting the winners' new layers on top of the
        compacted base (Iceberg RewriteFiles validation analog; see
        ``_rebase_rewrite_base``). A winner that rewrote the
        compaction's inputs (COW merge, another compaction, rebucket,
        rollback) raises CommitConflict: the folded data is stale,
        rerun the compaction."""
        snap = self.snapshot()
        if zorder_by is not None and sort_by is not None:
            raise ValueError("sort_by and zorder_by are exclusive")
        counts: dict[int, int] = {}
        for f in self.files(snap):
            counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
        if zorder_by is not None:
            z_cols = list(zorder_by)
            if len(z_cols) < 2:
                raise ValueError("zorder_by needs >=2 columns "
                                 "(use sort_by for one)")
            by_name = {f["name"]: f for f in self.fields(snap)}
            unknown = [c for c in z_cols if c not in by_name]
            if unknown:
                raise ValueError(f"unknown zorder_by columns {unknown}")
            bad = [c for c in z_cols
                   if by_name[c]["type"] not in _STAT_TYPES]
            if bad:
                raise ValueError(
                    f"zorder_by columns not orderable: {bad}")
            fat = set(counts)
        elif sort_by is not None:
            sort_cols = ([sort_by] if isinstance(sort_by, str)
                         else list(sort_by))
            known = {f["name"] for f in self.fields(snap)}
            unknown = [c for c in sort_cols if c not in known]
            if unknown:
                raise ValueError(f"unknown sort_by columns {unknown}")
            fat = set(counts)
        else:
            fat = {b for b, c in counts.items()
                   if c > max_files_per_bucket}
        if drop_tombstones_below_lsn is not None:
            thr = int(drop_tombstones_below_lsn)
            for e in self.files(snap):
                st = (e.get("stats") or {}).get(SYS_LSN)
                if st is None or int(st[0]) < thr:
                    fat.add(e["bucket"])
        if not fat:
            return {"compacted_buckets": 0, "version": snap["version"]}

        fields = self.fields(snap)
        # reconciled read: folding delta layers into the base applies
        # the same max-(lsn, deleted) winner rule reads use, so the
        # compacted base is byte-equivalent to the pre-compaction view
        # (tombstones retained — the delete guard must survive)
        df = self._read_reconciled(snap, fat).withColumn(
            SYS_BUCKET, self.bucket_expr(F.col(self.key_field(snap)))
        )
        if drop_tombstones_below_lsn is not None:
            # erase expired tombstones (see docstring) — applied AFTER
            # reconciliation, so only a key's WINNING row can qualify;
            # live rows never match the filter
            df = df.filter(~(F.col(SYS_DELETED)
                             & (F.col(SYS_LSN)
                                < int(drop_tombstones_below_lsn))))
        out_dir = os.path.join(self.data_dir, f"compact-{uuid.uuid4().hex}")
        phys = {f"f_{f['id']}": f["type"] for f in fields}
        projected = df.select(
            *[F.col(f["name"]).alias(f"f_{f['id']}") for f in fields],
            F.col(SYS_LSN),
            F.col(SYS_DELETED),
            F.col(SYS_BUCKET),
        )
        writer = projected.repartition(len(fat), F.col(SYS_BUCKET))
        if sort_by is not None:
            # sorted runs per bucket directory: with maxRecordsPerFile
            # the writer splits each directory's sequential sorted rows
            # into files, so every file is one contiguous value range
            name_to_phys = {f["name"]: f"f_{f['id']}" for f in fields}
            writer = writer.sortWithinPartitions(
                F.col(SYS_BUCKET),
                *[F.col(name_to_phys[c]) for c in sort_cols])
        elif zorder_by is not None:
            by_name = {f["name"]: f for f in fields}
            aggs = []
            for i, c in enumerate(z_cols):
                fld = by_name[c]
                # string dims aggregate the RAW min/max (the rank
                # window position depends on their common prefix,
                # known only after this job); others aggregate the
                # rank directly
                src = (F.col(f"f_{fld['id']}")
                       if fld["type"] == "string"
                       else _zorder_rank_expr(f"f_{fld['id']}",
                                              fld["type"]))
                aggs += [F.min(src).alias(f"lo{i}"),
                         F.max(src).alias(f"hi{i}")]
            # one min/max aggregation over the pre-repartition
            # projection (no exchange in the bounds job); the collect
            # is 2 scalars per dimension (bounded driver metadata,
            # like the bloom/stats jobs)
            b = projected.agg(*aggs).collect()[0]
            ranks, bounds = [], []
            for i, c in enumerate(z_cols):
                fld = by_name[c]
                lo, hi = b[f"lo{i}"], b[f"hi{i}"]
                if fld["type"] == "string":
                    # rank the 6 bytes AFTER the dimension-wide common
                    # prefix (shared by every value between min and
                    # max), and derive the bounds driver-side from the
                    # min/max strings — rank is order-preserving, so
                    # rank(min)/rank(max) ARE lo/hi (no second job)
                    off = (_lcp_bytes(lo, hi)
                           if lo is not None and hi is not None else 0)
                    ranks.append(_zorder_rank_expr(
                        f"f_{fld['id']}", "string", str_offset=off))
                    lo = (None if lo is None
                          else _zorder_str_rank_value(lo, off))
                    hi = (None if hi is None
                          else _zorder_str_rank_value(hi, off))
                else:
                    ranks.append(_zorder_rank_expr(
                        f"f_{fld['id']}", fld["type"]))
                bounds.append((lo, hi))
            norms = [_zorder_norm(r, lo, hi, len(ranks))
                     for r, (lo, hi) in zip(ranks, bounds)]
            writer = writer.sortWithinPartitions(
                F.col(SYS_BUCKET), _zorder_key(norms))
        w = writer.write.mode("overwrite")
        if rows_per_file is not None:
            w = w.option("maxRecordsPerFile", int(rows_per_file))
        w.partitionBy(SYS_BUCKET).parquet(out_dir)
        new_files = self._collect_written_files(out_dir, phys)[0]
        self._attach_key_blooms(snap, new_files)

        by_bucket: dict[str, list[dict]] = {}
        for fmeta in new_files:
            by_bucket.setdefault(str(fmeta["bucket"]), []).append(fmeta)
        # Manifests are path-referenced everywhere (the change feed
        # resolves a merge's own manifest from its lineage entry), so
        # the rewrite's manifest is written ONCE at a unique path and
        # re-pointed across commit retries — no writer can clobber
        # another's file list during the write-then-commit window.
        manifest_path = self._write_manifest(snap["version"] + 1, by_bucket)
        lin = {"type": "compaction", "buckets": sorted(fat),
               **({"sort_by": sort_cols} if sort_by else {}),
               **({"zorder_by": z_cols} if zorder_by else {}),
               **({"drop_tombstones_below_lsn":
                   int(drop_tombstones_below_lsn)}
                  if drop_tombstones_below_lsn is not None else {})}
        # Commit with rebase-on-conflict (Iceberg RewriteFiles
        # validation analog): losing the commit race to the ingest
        # stream must not waste the data rewrite above. As long as
        # every input layer this compaction folded is STILL the prefix
        # of its bucket's manifest list in the winner's snapshot —
        # true when the concurrent commits only APPENDED delta layers,
        # the streaming-ingest shape — the new layers are adopted ON
        # TOP of the compacted base: their rows carry newer LSNs, so
        # the usual max-(lsn, deleted) reconciliation yields exactly
        # "compact, then apply the concurrent batch". Anything that
        # REWROTE an input (COW merge, another compaction, rebucket,
        # rollback) makes the folded data stale — hard CommitConflict,
        # rerun the compaction.
        consumed = {str(b): list(snap["manifests"].get(str(b), []))
                    for b in fat}
        base = snap
        for attempt in range(_COMMIT_RETRIES):
            version = base["version"] + 1
            manifests = {b: list(v) for b, v in base["manifests"].items()}
            for b in fat:
                sb = str(b)
                adopted = base["manifests"].get(sb, [])[len(consumed[sb]):]
                rebased = ([manifest_path] if sb in by_bucket else []) \
                    + adopted
                if rebased:
                    manifests[sb] = rebased
                else:
                    manifests.pop(sb, None)
            snap2 = dict(base)
            snap2["version"] = version
            snap2["parent"] = base["version"]
            snap2["manifests"] = manifests
            snap2["committed_at"] = time.time()
            snap2["lineage"] = lin
            try:
                self._write_snapshot(snap2)
            except CommitConflict:
                base = self._rebase_rewrite_base(snap, fat, consumed)
                continue
            self._append_lineage(version, lin)
            return {"compacted_buckets": len(fat), "version": version,
                    "rebases": attempt}
        raise CommitConflict(
            f"compaction lost the commit race {_COMMIT_RETRIES} times "
            f"in a row — rerun it")

    def _rebase_rewrite_base(self, snap0: dict, fat: set[int],
                             consumed: dict[str, list[str]]) -> dict:
        """Validate that a layout rewrite staged against ``snap0`` can
        re-commit on top of the CURRENT snapshot after losing a commit
        race, and return that snapshot to rebase onto. Sound iff the
        winner(s) did not rewrite any of the rewrite's inputs: per
        rewritten bucket the current manifest list must still START
        WITH the exact layer list the rewrite folded (concurrent delta
        merges only append), under the same bucket layout. Concurrent
        schema evolution is fine — the rebase adopts the current
        schema, and every file entry carries its own physical
        signature, so the rewritten files read back like any other
        pre-evolution files. Raises CommitConflict when the folded
        data is stale (COW merge / compaction / rollback / rebucket
        touched an input)."""
        cur = self.snapshot()
        if cur["n_buckets"] != snap0["n_buckets"]:
            raise CommitConflict(
                "a concurrent rebucket changed the partition layout "
                "under this compaction — rerun it on the new layout")
        for b in sorted(fat):
            sb = str(b)
            want = consumed[sb]
            if cur["manifests"].get(sb, [])[: len(want)] != want:
                raise CommitConflict(
                    f"bucket {sb}'s files were rewritten by a "
                    f"concurrent commit — this compaction's inputs "
                    f"are stale, rerun it")
        return cur

    def rebucket(self, n_buckets: int) -> dict:
        """Partition evolution (Iceberg
        ``REPLACE PARTITION FIELD bucket(old, key) WITH bucket(new, key)``
        analog): rewrite the table under a new bucket count and commit
        it as one snapshot. Needed at design scale — a bucket count
        sized for the first 10^8 rows concentrates too many rows per
        bucket at 10^10, and COW merge / pruning granularity is per
        bucket. ``n_buckets`` lives in the snapshot, so earlier
        snapshots keep reading their own layout (time travel intact)
        and every post-rebucket merge hashes with the new count.
        Tombstones survive the rewrite (same winner-rule reconciled
        read as compaction).

        Unlike ``compact``, a rebucket that loses a commit race fails
        fast (no rebase): its inputs are EVERY bucket, and a
        concurrent delta layer is hashed with the OLD bucket count —
        adopting it under the new layout would misroute its keys.
        Rerun the rebucket in a quiesced window."""
        snap = self.snapshot()
        if n_buckets == snap["n_buckets"]:
            return {"rebucketed": False, "version": snap["version"]}
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        fields = self.fields(snap)
        key = self.key_field(snap)
        new_expr = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast(
            "int"
        )
        df = self._read_reconciled(snap, None).withColumn(
            SYS_BUCKET, new_expr
        )
        out_dir = os.path.join(self.data_dir, f"rebucket-{uuid.uuid4().hex}")
        phys = {f"f_{f['id']}": f["type"] for f in fields}
        (
            df.select(
                *[F.col(f["name"]).alias(f"f_{f['id']}") for f in fields],
                F.col(SYS_LSN),
                F.col(SYS_DELETED),
                F.col(SYS_BUCKET),
            )
            .repartition(n_buckets, F.col(SYS_BUCKET))
            .write.mode("overwrite")
            .partitionBy(SYS_BUCKET)
            .parquet(out_dir)
        )
        new_files = self._collect_written_files(out_dir, phys)[0]
        self._attach_key_blooms(snap, new_files)

        version = snap["version"] + 1
        by_bucket: dict[str, list[dict]] = {}
        for fmeta in new_files:
            by_bucket.setdefault(str(fmeta["bucket"]), []).append(fmeta)
        manifest_path = self._write_manifest(version, by_bucket)
        snap2 = dict(snap)
        snap2["version"] = version
        snap2["parent"] = snap["version"]
        snap2["n_buckets"] = n_buckets
        # the old layout's manifests are fully superseded
        snap2["manifests"] = {b: [manifest_path] for b in by_bucket}
        snap2["committed_at"] = time.time()
        lin = {
            "type": "rebucket",
            "from": snap["n_buckets"],
            "to": n_buckets,
        }
        snap2["lineage"] = lin
        self._write_snapshot(snap2)
        self._append_lineage(version, lin)
        out = {"rebucketed": True, "version": version,
               "n_buckets": n_buckets}
        iceberg_table = os.environ.get("SPARK_GRAFT_ICEBERG_TABLE")
        if iceberg_table:
            from clinical_trials_etl_spark.lake import iceberg_sql

            out["iceberg_sql"] = [
                iceberg_sql.replace_partition_statement(
                    iceberg_table, key, snap["n_buckets"], n_buckets
                )
            ]
        return out

    def expire_snapshots(self, keep_last: int = 2,
                         older_than_s: float | None = None) -> dict:
        """Delete data files no snapshot in the retained window
        references (Iceberg expire_snapshots analog). Keeps the last
        ``keep_last`` snapshots readable (time travel window); older
        snapshot JSONs remain (tiny) but their exclusive files go.
        ``older_than_s`` ADDS age-based retention (Iceberg
        ``expire_snapshots(older_than=ts, retain_last=N)``): every
        snapshot committed within the last ``older_than_s`` seconds is
        also kept, with ``keep_last`` as the floor — 'keep 72 hours of
        time travel, and never fewer than 2 snapshots'. Commit
        timestamps are stamped at snapshot-link time and monotone in
        version, so the age walk stops at the first too-old snapshot
        (O(retained) metadata reads).
        Tagged versions are ALWAYS retained — a tag is an explicit pin
        that outranks the sliding window (Iceberg ref-aware snapshot
        retention), so audit/repro reads stay valid until the tag is
        dropped. Staged WAP commits' files are likewise protected
        until published or aborted, and so are files referenced by any
        BRANCH snapshot (a branch pins its whole chain until published
        or dropped)."""
        self._require_main("expire_snapshots")
        current = self.current_version()
        window = {
            v
            for v in range(max(0, current - keep_last + 1), current + 1)
            if os.path.exists(self._snap_path(v))
        }
        if older_than_s is not None:
            cutoff = time.time() - older_than_s
            for v in range(current, -1, -1):
                if not os.path.exists(self._snap_path(v)):
                    continue
                if self.snapshot(v).get("committed_at", 0) < cutoff:
                    break  # monotone timestamps: everything below is older
                window.add(v)
        keep_versions = sorted(
            window
            | {
                v for v in self.tags().values()
                if os.path.exists(self._snap_path(v))
            }
        )
        live: set[str] = self._staged_file_paths() | self._branch_file_paths()
        for v in keep_versions:
            for f in self.files(self.snapshot(v)):
                live.add(f["path"])
        removed = 0
        for dirpath, _dirs, files in os.walk(self.data_dir):
            for fn in files:
                path = os.path.join(dirpath, fn)
                if fn.endswith(".parquet") and path not in live:
                    os.remove(path)
                    removed += 1
        return {"removed_files": removed, "kept_versions": keep_versions}

    def history(self) -> list[dict]:
        """Commit history, newest first (Delta DESCRIBE HISTORY /
        Iceberg snapshots-metadata analog): one row per EXISTING
        snapshot with its commit timestamp, parent, operation type and
        the commit's lineage detail (epoch, touched buckets, lsn
        range, row counts — whatever that operation recorded).
        Snapshots removed by retention simply don't appear; their
        lineage sidecars remain available via ``lineage()``. Driver-
        side metadata only — no Spark job. Rows carry the tags pinning
        their version, if any."""
        by_version: dict[int, list[str]] = {}
        for name, v in self.tags().items():
            by_version.setdefault(v, []).append(name)
        out: list[dict] = []
        for fn in sorted(os.listdir(self.meta_dir), reverse=True):
            if not (fn.startswith("snap-") and fn.endswith(".json")):
                continue
            with open(os.path.join(self.meta_dir, fn)) as f:
                snap = json.load(f)
            lin = snap.get("lineage") or self._lineage_entry(snap["version"])
            out.append({
                "version": snap["version"],
                "parent": snap["parent"],
                "committed_at": snap["committed_at"],
                "operation": (lin or {}).get(
                    "type", "create" if snap["version"] == 0 else None),
                "n_buckets": snap["n_buckets"],
                "tags": sorted(by_version.get(snap["version"], [])),
                "detail": lin or {},
            })
        return out

    def rollback(self, version: int | str) -> dict:
        """Restore the table to snapshot ``version`` as a NEW commit
        (Iceberg rollback / Delta RESTORE analog) — metadata-only: the
        new snapshot re-references the target's manifests, no data
        moves, and every intermediate version stays time-travel
        readable (the bad history is preserved evidence, not erased).

        The idempotency ledger (``batch_hwm``/``applied_recent``)
        restores to the TARGET's values on purpose: re-delivering the
        epochs that came after ``version`` must re-APPLY, not no-op —
        that is the point of a CDC rollback (bad-deploy recovery: roll
        back, fix the code, replay the same log segments). Schema and
        bucket count restore too — a bad evolution or rebucket is as
        revertible as bad data.

        Downstream increments: ``changes()`` over a window containing
        a rollback commit fails fast (a revert is not incrementally
        foldable); mirrors and materialized views resync from a full
        read.

        ``version`` also accepts a tag name — ``rollback("pre-deploy")``
        is the recovery drill's natural spelling."""
        if isinstance(version, str):
            version = self._resolve_ref(version)
        cur = self.current_version()
        if not 0 <= version <= cur:
            raise ValueError(
                f"cannot roll back to v{version} (current {cur})")
        if version == cur:
            return {"rolled_back_to": version, "version": cur,
                    "noop": True}
        target = self.snapshot(version)
        for e in self.files(target):
            if not os.path.exists(e["path"]):
                raise ValueError(
                    f"v{version} is no longer readable (files removed "
                    f"by expire_snapshots) — cannot roll back to it")
        snap2 = dict(target)
        snap2["version"] = cur + 1
        snap2["parent"] = cur
        snap2["committed_at"] = time.time()
        lin = {"type": "rollback", "to": version}
        snap2["lineage"] = lin  # replace the target's embedded entry
        self._write_snapshot(snap2)
        self._append_lineage(cur + 1, lin)
        return {"rolled_back_to": version, "version": cur + 1}

    def remove_orphans(self, older_than_s: float = 86400.0) -> dict:
        """Delete data files NO existing snapshot references (Iceberg
        remove_orphan_files analog). Every write path in this format
        produces its parquet output FIRST and commits the snapshot
        SECOND — a crash in that window leaves the table consistent
        but strands the output directory forever; nothing ever
        references it, so ``expire_snapshots`` retention math never
        touches it either. This reclaims exactly that residue while
        keeping EVERY snapshot readable (unlike expire, which trades
        time-travel depth for space).

        ``older_than_s``: only files at least this old are swept — the
        guard that makes the sweep safe to schedule next to in-flight
        writes (a file being written RIGHT NOW is young, unreferenced,
        and must survive). Iceberg's remove_orphan_files defaults to
        3 days for the same reason; crash residue is by definition old
        by the time a maintenance job runs.

        Staged (unpublished) WAP commits' files count as referenced —
        a candidate awaiting its audit verdict is not residue — and so
        do files referenced by any branch snapshot."""
        self._require_main("remove_orphans")
        referenced: set[str] = (self._staged_file_paths()
                                | self._branch_file_paths())
        for fn in os.listdir(self.meta_dir):
            if not (fn.startswith("snap-") and fn.endswith(".json")):
                continue
            with open(os.path.join(self.meta_dir, fn)) as f:
                snap = json.load(f)
            for e in self.files(snap):
                referenced.add(e["path"])
        cutoff = time.time() - older_than_s
        removed = 0
        for dirpath, _dirs, files in os.walk(self.data_dir, topdown=False):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue  # never touch unknown files here
                path = os.path.join(dirpath, fn)
                if path in referenced:
                    continue
                try:
                    if os.path.getmtime(path) > cutoff:
                        continue
                    os.remove(path)
                except OSError:
                    continue
                removed += 1
            # a directory the sweep emptied down to its _SUCCESS
            # marker is pure crash residue — drop marker + dir
            # (committed dirs keep referenced parquet, so their
            # markers survive); walk is bottom-up, so bucket subdirs
            # are pruned before their output root is examined
            if dirpath == self.data_dir:
                continue
            try:
                left = os.listdir(dirpath)
                if left == ["_SUCCESS"]:
                    marker = os.path.join(dirpath, "_SUCCESS")
                    if os.path.getmtime(marker) <= cutoff:
                        os.remove(marker)
                        left = []
                if not left:
                    os.rmdir(dirpath)
            except OSError:
                pass
        return {"removed_files": removed,
                "referenced_files": len(referenced)}

    # ----------------------------------------------------------- merge

    # At or above this many written files, footer stats are collected
    # by ONE distributed Spark job instead of serial driver-side reads.
    # Measured (BENCH/stats_collect_r5.json, local[32] NVMe): the
    # distributed job is FLAT in file count (~0.9-1.1 s from 256 to
    # 4096 files — fixed job-launch cost) while serial grows linearly
    # at ~0.19 ms/file, so the local crossover is ~10^4 files. The
    # default keeps micro-batch merges and mid-size compactions on the
    # cheap serial path; deployments on object storage should set
    # SPARK_GRAFT_STATS_DISTRIBUTED_MIN_FILES much lower (~100) —
    # per-footer GET latency there is ~100x local, which is where a
    # full-table rebucket at 10^5 files would otherwise stall the
    # driver for minutes (VERDICT r4 #1).
    STATS_DISTRIBUTED_MIN_FILES = int(
        os.environ.get("SPARK_GRAFT_STATS_DISTRIBUTED_MIN_FILES", "8192"))

    def _footer_stats_distributed(
        self, paths: list[str], stat_cols: set[str]
    ) -> dict[str, tuple[int, dict]]:
        """Per-file (row count, min/max stats) via one narrow
        distributed job: executors read parquet FOOTERS only (pyarrow
        metadata, zero data bytes) — the same read and the same
        ``_stat_encode`` semantics as the serial path, so manifests
        are identical whichever path ran (pinned in
        tests/test_lake_metadata.py). Arrow-batched ``mapInPandas``
        over the path list; the collect returns O(files) small rows —
        bounded driver metadata, same class as the bloom build."""
        sc_cols = sorted(stat_cols)

        def read_footers(batches):
            import pandas as pd

            wanted = set(sc_cols)
            for pdf in batches:
                rows = []
                for p in pdf["path"]:
                    n_rows, stats = _parquet_footer(p, wanted)
                    rows.append((p, n_rows, json.dumps(stats)))
                yield pd.DataFrame(
                    rows, columns=["path", "n_rows", "stats"])

        n_parts = min(
            len(paths), self.spark.sparkContext.defaultParallelism)
        df = (
            self.spark.createDataFrame([(p,) for p in paths],
                                       "path string")
            .repartition(n_parts)
            .mapInPandas(read_footers,
                         "path string, n_rows long, stats string")
        )
        return {r["path"]: (r["n_rows"], json.loads(r["stats"]))
                for r in df.collect()}

    def _collect_written_files(
        self, out_dir: str, phys: dict
    ) -> tuple[list[dict], int]:
        """Enumerate bucket-partitioned parquet output -> (file entries,
        total rows). Row counts AND per-file min/max column stats come
        from parquet footers (metadata only — never a data read), the
        Iceberg manifest-stats analog that ``read(between=...)`` skips
        files with. Small outputs (micro-batch merges) read footers
        driver-side; large outputs (full-table compact/rebucket) fan
        the footer reads out as one distributed job — see
        ``STATS_DISTRIBUTED_MIN_FILES``."""
        stat_cols = {
            n for n, t in phys.items() if t in _STAT_TYPES
        } | {SYS_LSN}
        located: list[tuple[str, int]] = []
        for bucket_dir in sorted(os.listdir(out_dir)):
            if not bucket_dir.startswith(f"{SYS_BUCKET}="):
                continue
            bucket = int(bucket_dir.split("=")[1])
            for fn in sorted(os.listdir(os.path.join(out_dir, bucket_dir))):
                if fn.endswith(".parquet"):
                    located.append(
                        (os.path.join(out_dir, bucket_dir, fn), bucket))
        if len(located) >= self.STATS_DISTRIBUTED_MIN_FILES:
            footers = self._footer_stats_distributed(
                [p for p, _b in located], stat_cols)
        else:
            footers = {p: _parquet_footer(p, stat_cols)
                       for p, _b in located}
        new_files: list[dict] = []
        total_rows = 0
        for path, bucket in located:
            n_rows, stats = footers[path]
            total_rows += n_rows
            new_files.append(
                {"path": path, "bucket": bucket, "phys": phys,
                 "stats": stats}
            )
        return new_files, total_rows

    _BLOOM_K = 4  # probes per key; fpp ~ (1 - e^(-K*n/m))^K

    @staticmethod
    def _bloom_probe_expr(key_col, j: int, m_bits: int) -> F.Column:
        """Probe j's bit position for a key: an independent hash per
        probe via xxhash64 over the (key, probe-index) tuple — no
        h1+j*h2 arithmetic, which would overflow long under ANSI mode.
        MUST stay identical between write (_attach_key_blooms) and
        lookup; both sides evaluate it in Spark so the hash is the
        same implementation bit-for-bit."""
        return F.pmod(F.xxhash64(key_col, F.lit(j)), F.lit(m_bits))

    def _attach_key_blooms(self, snap: dict,
                           new_files: list[dict]) -> None:
        """Record a per-file bloom filter over the key column in each
        manifest entry (Parquet/Iceberg bloom-filter analog, held at
        the manifest so skipping needs no file I/O at all). ONE narrow
        distributed job over the just-written files' key column —
        O(batch) work reading a single column, never a driver-side
        data read. Files whose bloom cannot be computed simply get no
        entry (absent bloom == never skipped)."""
        m_bits = snap.get("key_bloom_bits")
        if not m_bits or not new_files:
            return
        key = self.key_field(snap)
        fid = next(f["id"] for f in self.fields(snap) if f["name"] == key)
        phys_key = f"f_{fid}"
        key_type = new_files[0]["phys"].get(phys_key)
        if key_type is None:
            return
        n_words = m_bits // 64
        schema = T.StructType([T.StructField(phys_key,
                                             _spark_type(key_type))])
        df = (
            self.spark.read.schema(schema)
            .parquet(*[e["path"] for e in new_files])
            .select(F.input_file_name().alias("_f"),
                    F.col(phys_key).alias("_k"))
        )
        for j in range(self._BLOOM_K):
            df = df.withColumn(
                f"_p{j}", self._bloom_probe_expr(F.col("_k"), j, m_bits))
        # per row and word w: OR of SHIFTLEFT(1, p%64) for probes
        # landing in w; bit_or-aggregated per file
        aggs = []
        for w in range(n_words):
            terms = " | ".join(
                f"(CASE WHEN (_p{j} DIV 64) = {w} THEN "
                f"SHIFTLEFT(1L, CAST(_p{j} % 64 AS INT)) ELSE 0L END)"
                for j in range(self._BLOOM_K))
            aggs.append(F.bit_or(F.expr(terms)).alias(f"w{w}"))
        from urllib.parse import unquote, urlparse

        # realpath on BOTH sides: input_file_name() returns a URI whose
        # unquoted path may differ from the manifest's path through a
        # symlinked table root or mount alias — an unmatched join here
        # would silently disable the feature (no bloom == never skip)
        blooms = {
            os.path.realpath(unquote(urlparse(r["_f"]).path)):
                [r[f"w{w}"] for w in range(n_words)]
            for r in df.groupBy("_f").agg(*aggs).collect()
        }
        matched = 0
        for e in new_files:
            words = blooms.get(os.path.realpath(e["path"]))
            if words is not None:
                e["key_bloom"] = words
                matched += 1
        if blooms and not matched:
            import warnings

            warnings.warn(
                f"key-bloom build matched none of {len(new_files)} new "
                f"files (path normalization mismatch?) — lookups will "
                f"not skip these files", RuntimeWarning, stacklevel=2)

    def bucket_expr(self, key_col) -> F.Column:
        n = self.snapshot()["n_buckets"]
        return F.pmod(F.xxhash64(key_col), F.lit(n)).cast("int")

    # Above this many bytes of touched target data, the COW merge
    # switches from the wide winner aggregation to the broadcast winner
    # plan (see _cow_merged). Measured crossover on local[32]: at
    # ~30 MB touched the agg plan replays 200k events ~20% faster (the
    # broadcast plan pays ~0.45 s/epoch of serialized broadcast-build
    # latency); at ~250 MB the two are at parity; beyond that the agg
    # plan's table-sized exchange + sort grows linearly while the
    # broadcast plan's exchanges stay batch-sized. On a cluster the
    # crossover is lower (exchange = network, broadcast build is
    # latency-bound) — override via SPARK_GRAFT_COW_BROADCAST_BYTES.
    COW_BROADCAST_BYTES = int(
        os.environ.get("SPARK_GRAFT_COW_BROADCAST_BYTES",
                       str(192 * 1024 * 1024)))

    def _touched_bytes(self, snap: dict, touched: set[int]) -> int:
        """Driver-side size of the touched buckets' data files (os.stat
        over the manifest's file list — no Spark job)."""
        total = 0
        for fmeta in self.files(snap, touched):
            try:
                total += os.path.getsize(fmeta["path"])
            except OSError:
                pass
        return total

    def _cow_merged(self, snap, src: DataFrame, key: str,
                    touched: set[int], fill,
                    source_unique: bool = False) -> DataFrame:
        """The rows a COW commit writes: per-key max-(lsn, deleted)
        winners of target(touched buckets) vs the batch.

        Two physically different plans compute the same rows; the
        switch is on touched-target size (COW_BROADCAST_BYTES):

        - **agg plan** (small touched set): union(target, batch) ->
          max_by winner aggregation. One table-sized exchange feeding
          the write's clustering exchange; map-side partial
          aggregation collapses duplicate deliveries AND hot keys
          before the shuffle. Lowest fixed cost per commit.
        - **broadcast plan** (large touched set): a COW table is
          one-row-per-key at rest, so the winner decision is a
          pairwise compare of the deduped batch row vs the key's
          single target row — computed over slim column-pruned scans
          and applied via TWO broadcast joins (b_slim, then the
          O(batch) set of keys the target beat). The full-width
          target crosses NO exchange except the write clustering:
          per-commit shuffle volume is O(batch) + one table-sized
          clustering pass, vs the agg plan's additional table-sized
          aggregation exchange *and* its SortAggregate (max_by over a
          struct payload cannot hash-aggregate, so every html payload
          is sorted twice). At 10^10-row scale the agg plan re-sorts
          and re-shuffles the table every epoch; the broadcast plan
          does not.

        Both plans run ``fill`` (Arrow text extraction) only on rows
        whose text is null — i.e. O(batch) kernel work either way
        (cdc/apply.py::fill_text_post_winner splits the frame so the
        UDF's input plan contains only needy rows).

        Winner-tie semantics are identical and deterministic: tombstone
        outranks live at equal lsn; at a full (lsn, deleted) tie the
        agg plan's max_by picks either side and the broadcast plan
        picks the batch side — a redelivery's content is byte-identical
        by construction (deterministic extraction), so both yield the
        same bytes."""
        target = self.read_raw(buckets=touched).withColumn(
            SYS_BUCKET, self.bucket_expr(F.col(key))
        )
        payload = F.struct(*[c for c in src.columns if c != key])
        order = F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))

        if self._touched_bytes(snap, touched) < self.COW_BROADCAST_BYTES:
            merged = (
                target.unionByName(src)
                .groupBy(key)
                .agg(F.max_by(payload, order).alias("_p"))
                .select(key, "_p.*")
            )
            return fill(merged) if fill is not None else merged

        # broadcast plan ------------------------------------------------
        # per-key dedup of the batch (duplicate deliveries collapse
        # map-side; batch-sized shuffle) — skipped when the caller
        # already deduped (salted path), saving a full-batch shuffle
        if source_unique:
            src_one = src
        else:
            src_one = (
                src.groupBy(key)
                .agg(F.max_by(payload, order).alias("_p"))
                .select(key, "_p.*")
            )
        # slim per-key batch winner, computed independently of the wide
        # dedup via max(struct) so the broadcast build scans only three
        # pruned parquet columns. Same ordering struct as max_by above,
        # so the (lsn, deleted) winner per key matches by construction.
        b_slim = (
            src.groupBy(key)
            .agg(F.max(order).alias("_w"))
            .select(
                F.col(key),
                F.col(f"_w.{SYS_LSN}").alias("_b_lsn"),
                F.col(f"_w.{SYS_DELETED}").alias("_b_del"),
            )
        )
        batch_wins = (
            F.struct(F.col("_b_lsn"), F.col("_b_del"), F.lit(1))
            > F.struct(F.col(SYS_LSN), F.col(SYS_DELETED), F.lit(0))
        )
        # target keeps every key the batch didn't beat; the b_slim
        # broadcast exchange is built once and reused below
        keep_target = (
            target.join(F.broadcast(b_slim), key, "left")
            .where(F.coalesce(~batch_wins, F.lit(True)))
            .drop("_b_lsn", "_b_del")
        )
        # keys where the TARGET won (O(batch) rows, slim scans only)
        # knock their rows out of the batch side
        t_beats = (
            target.select(key, SYS_LSN, SYS_DELETED)
            .join(F.broadcast(b_slim), key, "inner")
            .where(~batch_wins)
            .select(key)
        )
        keep_batch = src_one.join(F.broadcast(t_beats), key, "left_anti")
        if fill is not None:
            # Arrow extraction on surviving batch rows only — target
            # rows carry their text from their original apply and
            # never enter the Python worker
            keep_batch = fill(keep_batch)
        return keep_target.unionByName(keep_batch)

    def merge(
        self,
        source: DataFrame,
        lsn_col: str = "lsn",
        op_col: str = "op",
        batch_id: str | None = None,
        lineage: dict | None = None,
        touched_hint: set[int] | None = None,
        mode: str = "cow",
        fill: Callable[[DataFrame], DataFrame] | None = None,
        source_unique: bool = False,
        wap_id: str | None = None,
        add_correction_fence: int | None = None,
    ) -> dict:
        """LSN-guarded keyed MERGE (I/U upsert, D tombstone) into the
        touched buckets. ``source`` must carry the table's data columns
        plus ``lsn_col``/``op_col``. In ``"cow"`` mode the merge dedups
        the source to one row per key itself (batch-sized max_by), so
        the source may carry duplicate deliveries — unless the caller
        states ``source_unique=True`` (already one row per key, e.g.
        the salted pre-dedup path), which skips the redundant dedup
        shuffle; ``"delta"`` commits
        source rows as-is, so the caller must pre-dedup (cdc/apply.py
        does the salted max-LSN dedup there).

        ``fill``: optional column transform (cow only) applied to the
        winner rows just before the bucket write — the seam
        cdc/apply.py uses to run the Arrow text extraction exactly once
        per winning NEW row (its split-filter keeps already-extracted
        target rows out of the Python worker in both plans).

        ``mode``:
        - ``"cow"`` (copy-on-write): read the touched buckets, decide
          the max-(lsn, deleted) winner per key, rewrite those buckets
          as fresh base files. Two physical winner plans, switched on
          touched-target size (see _cow_merged): a wide max_by
          aggregation when the touched set is small, and a slim
          broadcast-join decision when it is large — the latter keeps
          the full-width target out of every exchange except the write
          clustering, so per-epoch shuffle volume stays O(batch) as
          the table grows. Reads stay reconciliation-free; each commit
          rewrites whole buckets.
        - ``"delta"`` (merge-on-read): append the batch as delta files
          per touched bucket WITHOUT reading or rewriting the base —
          O(batch) write cost instead of O(touched bucket size). Reads
          reconcile layers with the same winner rule; ``compact()``
          folds layers back into base files. This is the write-
          amplification fix at design scale: a 1k-row micro-batch must
          not rewrite a 10^8-row bucket (Iceberg MOR / position-delete
          analog, expressed as LSN-versioned row layers).

        ``touched_hint``: the exact set of buckets the source touches,
        when the caller can compute it more cheaply than running the
        source pipeline (cdc/apply.py derives it from a column-pruned
        url-only scan of the raw batch — dedup preserves the url set,
        so the hint is exact). With the hint, the expensive source
        pipeline (dedup shuffle + Arrow extraction) feeds exactly ONE
        action — the merge write — and row counts come from the written
        parquet footers driver-side; no persist, no extra job barriers
        (each extra action is a fixed cost that does not shrink with
        cores).

        ``wap_id``: write-audit-publish (Iceberg WAP analog). The merge
        runs in full — dedup, winner plan, bucket write — but the
        resulting snapshot is STAGED under this id instead of becoming
        current: readers of the table see nothing, auditors read the
        candidate state with ``read_staged(wap_id)``, and
        ``publish_staged(wap_id)`` makes it the next commit (metadata
        only — no data moves at publish). Crash between stage and
        publish loses nothing: the staged record protects its files
        from GC until published or ``abort_staged``-ed.

        Returns commit stats. Re-submitting an applied ``batch_id`` is a
        no-op (exactly-once under foreachBatch retry).

        Concurrency: a DELTA merge that loses the snapshot-commit race
        to a sanctioned maintenance commit (compaction, expiry, GC,
        evolution) rebases — its layer is appended on top of the
        winner, which is exactly "apply the batch to the winner's
        state" under max-LSN reconciliation. A rival MERGE writer or a
        concurrent rebucket is a hard CommitConflict, and COW merges
        never rebase (their winner decision may be stale)."""
        if mode not in ("cow", "delta"):
            raise ValueError(f"unknown merge mode {mode!r}")
        if wap_id is not None:
            self._staged_path(wap_id)  # validate id + fail fast on dup
            if os.path.exists(self._staged_path(wap_id)):
                raise ValueError(
                    f"wap_id {wap_id!r} already has a staged commit — "
                    f"publish or abort it first")
        if mode == "delta" and batch_id is not None and not self._BATCH_ID_RE.match(batch_id):
            # Non-numeric ids are deduped only via the bounded recent
            # set, degrading to at-least-once after _RECENT_CAP
            # commits. COW tolerates that (a redelivered batch is a
            # semantic no-op under the max-LSN winner rule), but delta
            # mode appends the redelivered rows as duplicate layers —
            # wasted bytes and double-counted lineage — so it requires
            # ids the durable per-prefix high-water mark can track.
            raise ValueError(
                f"delta mode requires a numeric-suffixed batch_id for "
                f"durable exactly-once tracking, got {batch_id!r}"
            )
        snap = self.snapshot()
        if batch_id is not None and self.is_applied(batch_id, snap):
            return {"skipped": True, "version": snap["version"]}

        fields = self.fields(snap)
        key = self.key_field(snap)
        names = [f["name"] for f in fields]

        src = source.select(
            *[F.col(n).cast(_spark_type(f["type"])).alias(n)
              for n, f in zip(names, fields)],
            F.col(lsn_col).cast("long").alias(SYS_LSN),
            (F.col(op_col) == "D").alias(SYS_DELETED),
        ).withColumn(SYS_BUCKET, self.bucket_expr(F.col(key)))

        persisted = False
        if touched_hint is not None:
            touched = set(touched_hint)
        else:
            # fallback: derive buckets from the source itself — needs a
            # second action over the pipeline, so persist it
            src = src.persist()
            persisted = True
            touched = {
                r[0] for r in src.select(SYS_BUCKET).distinct().collect()
            }

        fences = {int(p[0]): int(p[1])
                  for p in snap.get("correction_fences", [])}
        if fences:
            self._guard_correction_fences(snap, src, fences)

        if mode == "cow":
            merged = self._cow_merged(
                snap, src, key, touched, fill, source_unique)
        else:
            # delta: the (already per-key-deduped) batch rows ARE the
            # commit — no base read, no winner decision, no rewrite
            merged = src

        out_dir = os.path.join(self.data_dir, f"commit-{uuid.uuid4().hex}")
        phys = {f"f_{f['id']}": f["type"] for f in fields}
        write_df = merged.select(
            *[F.col(f["name"]).alias(f"f_{f['id']}") for f in fields],
            F.col(SYS_LSN),
            F.col(SYS_DELETED),
            F.col(SYS_BUCKET),
        )
        # one bucket-clustering exchange before the write (one file per
        # touched bucket; an unclustered dynamic-partition write was
        # measured 1.5-2x slower end-to-end — it fans each task across
        # every bucket dir, exploding file counts and writer overhead).
        # For cow this is the ONLY table-wide exchange in the commit
        # (the old winner aggregation was a second one).
        write_df = write_df.repartition(
            max(len(touched), 1), F.col(SYS_BUCKET))
        write_df.write.mode("overwrite").partitionBy(SYS_BUCKET).parquet(out_dir)

        new_files, merged_rows = self._collect_written_files(out_dir, phys)
        self._attach_key_blooms(snap, new_files)
        if mode == "delta":
            for fmeta in new_files:
                fmeta["delta"] = True

        if persisted:
            src.unpersist()

        version = snap["version"] + 1
        # immutable per-commit manifest holding ONLY the rewritten
        # buckets' file entries; untouched buckets keep their parent
        # manifest pointers — O(touched) new metadata per commit
        by_bucket: dict[str, list[dict]] = {}
        for fmeta in new_files:
            by_bucket.setdefault(str(fmeta["bucket"]), []).append(fmeta)
        if wap_id is None:
            manifest_path = self._write_manifest(version, by_bucket)
        else:
            # staged manifest lives outside the numbered chain — the
            # version number is provisional until publish, and
            # manifests are path-referenced everywhere, so the staged
            # path is first-class once the snapshot commits
            manifest_path = self._staged_manifest_path(wap_id)
            os.makedirs(self.staged_dir, exist_ok=True)
            tmp = manifest_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump({"version": version, "files": by_bucket}, f,
                          indent=1)
            os.replace(tmp, manifest_path)

        manifests = {b: list(v) for b, v in snap["manifests"].items()}
        if mode == "cow":
            # rewritten buckets: this manifest becomes the only layer
            for b in touched:
                manifests.pop(str(b), None)
            for b in by_bucket:
                manifests[b] = [manifest_path]
        else:
            # delta: append a layer per touched bucket, keep the base
            for b in by_bucket:
                manifests.setdefault(b, []).append(manifest_path)

        snap2 = {
            "version": version,
            "parent": snap["version"],
            "schema": snap["schema"],
            "n_buckets": snap["n_buckets"],
            **({"key_bloom_bits": snap["key_bloom_bits"]}
               if "key_bloom_bits" in snap else {}),
            "manifests": manifests,
            "batch_hwm": dict(snap["batch_hwm"]),
            "applied_recent": list(snap["applied_recent"]),
            **_fences_entry(snap, add_correction_fence, version),
            "committed_at": time.time(),
        }
        if batch_id is not None:
            self._record_applied(snap2, batch_id)
        lin_entry = {
            "type": "merge",
            "batch_id": batch_id,
            "merged_rows": merged_rows,
            "touched_buckets": sorted(touched),
            # the commit's OWN manifest — the change feed reads a
            # merge's exact file set from here (unique path; for WAP
            # stagings publish_staged re-points this at the adopted
            # chain copy)
            "commit_manifest": manifest_path,
            **(lineage or {}),
        }
        if wap_id is not None:
            self._write_staged(wap_id, {
                "wap_id": wap_id,
                "base_version": snap["version"],
                "batch_id": batch_id,
                "snap": snap2,
                "lineage": lin_entry,
                "staged_at": time.time(),
            })
            return {
                "staged": True,
                "wap_id": wap_id,
                "base_version": snap["version"],
                "merged_rows": merged_rows,
                "touched_buckets": len(touched),
            }
        snap2["lineage"] = lin_entry
        # Commit, rebasing a DELTA merge over sanctioned maintenance
        # rivals (the other direction of compact()'s rebase — together
        # they make ingest + out-of-band maintenance race-free in both
        # orders): a delta layer is just "these events, reconcile by
        # max-LSN at read", so appending it on top of a compaction /
        # expiry / GC / evolution / rollback winner is exactly "apply
        # the batch to the winner's state". A rival MERGE stays a hard
        # conflict (two ingest writers violate the
        # single-writer-per-checkpoint contract). COW merges never
        # rebase: their winner decision was computed against the base
        # state and may be stale.
        base, rebases = snap, 0
        for _ in range(_COMMIT_RETRIES):
            try:
                self._write_snapshot(snap2)
            except CommitConflict:
                if mode != "delta":
                    raise
                rebases += 1
                base = self._rebase_delta_merge_base(snap)
                if batch_id is not None and self.is_applied(batch_id, base):
                    return {"skipped": True, "version": base["version"]}
                version = base["version"] + 1
                # the already-written unique-path manifest is REUSED —
                # its file list is exactly this batch's layer; only
                # the snapshot pointers move to the new version
                manifests = {b: list(v)
                             for b, v in base["manifests"].items()}
                for b in by_bucket:
                    manifests.setdefault(b, []).append(manifest_path)
                snap2 = {
                    "version": version,
                    "parent": base["version"],
                    "schema": base["schema"],
                    "n_buckets": base["n_buckets"],
                    **({"key_bloom_bits": base["key_bloom_bits"]}
                       if "key_bloom_bits" in base else {}),
                    "manifests": manifests,
                    "batch_hwm": dict(base["batch_hwm"]),
                    "applied_recent": list(base["applied_recent"]),
                    **_fences_entry(base, add_correction_fence,
                                    version),
                    "committed_at": time.time(),
                    # rebase observability (bench/ops): how many times
                    # this commit re-read and re-pointed before landing
                    "lineage": dict(lin_entry, rebases=rebases),
                }
                if batch_id is not None:
                    self._record_applied(snap2, batch_id)
                continue
            self._append_lineage(snap2["version"], snap2["lineage"])
            return {
                "skipped": False,
                "version": snap2["version"],
                "merged_rows": merged_rows,
                "touched_buckets": len(touched),
                "rebases": rebases,
            }
        raise CommitConflict(
            f"merge lost the commit race {_COMMIT_RETRIES} times in a "
            f"row — retry the batch")

    def _rebase_delta_merge_base(self, snap0: dict) -> dict:
        """Validate that a delta merge staged against ``snap0`` can
        re-commit on top of the CURRENT snapshot after losing a commit
        race, and return that snapshot. Sound iff every winning commit
        since ``snap0`` was a sanctioned maintenance rival (compaction,
        snapshot expiry, orphan GC, schema evolution, rebucket-free
        rollback...) — anything that only changed layout/metadata, not
        which events the table has logically absorbed. A rival MERGE
        raises: two ingest writers on one table is a deployment error,
        not a race to absorb. A bucket-layout change raises: the
        staged layer's rows were bucketed with the old count and would
        misroute."""
        cur = self.snapshot()
        if cur["n_buckets"] != snap0["n_buckets"]:
            raise CommitConflict(
                "a concurrent rebucket changed the partition layout "
                "under this merge — re-bucket the batch and retry")
        for v in range(snap0["version"] + 1, cur["version"] + 1):
            lin = self.snapshot(v).get("lineage")
            if lin is not None and lin.get("type") in (
                    "merge", "fast_forward"):
                # a fast_forward is an ingest-class rival too: it
                # absorbed events (possibly via COW rewrites inside
                # the branch), so the staged layer's winner decision
                # may be stale — hard conflict, same doctrine
                raise CommitConflict(
                    f"version {v} was committed by a concurrent MERGE "
                    f"writer — one ingest writer per table; stop the "
                    f"duplicate job")
        return cur

    # ------------------------------------------------- row-level ops

    def _max_applied_lsn(self, snap: dict | None = None) -> int:
        """Highest ``_lsn`` stored anywhere in the snapshot (-1 for an
        empty table) — the fence base for lake-side corrections
        (``update_where``). Metadata-only on the normal path: every
        manifest entry records ``_lsn`` min/max footer stats
        (``_collect_written_files`` always includes ``SYS_LSN`` in
        ``stat_cols``); an entry whose footer poisoned the stat is
        max'd in via one lsn-column-only scan of just those files —
        never a payload read."""
        snap = snap if snap is not None else self.snapshot()
        hi = -1
        missing: list[dict] = []
        for e in self.files(snap):
            st = (e.get("stats") or {}).get(SYS_LSN)
            if st is None:
                missing.append(e)
            else:
                hi = max(hi, int(st[1]))
        if missing:
            key_fld = [f for f in self.fields(snap)
                       if f["name"] == self.key_field(snap)]
            row = (self._read_entries(key_fld, missing)
                   .agg(F.max(SYS_LSN)).collect()[0])
            if row[0] is not None:
                hi = max(hi, int(row[0]))
        return hi

    def _row_op_base(self, snap: dict, predicate, columns=None,
                     between=None) -> DataFrame:
        """Live winners matching ``predicate``, optionally projected
        to ``columns`` AT THE SCAN and bounded by the same manifest
        stats ``read(between=...)`` uses — on a time-clustered table
        a time-bounded correction touches O(window) files, not
        O(table). The winner decision depends only on (lsn, deleted),
        so any projection yields the same row set."""
        pred = (F.expr(predicate) if isinstance(predicate, str)
                else predicate)
        if between is None:
            base = self._read_reconciled(snap, None, columns)
        else:
            col, lo, hi = between
            if lo is None and hi is None:
                raise ValueError("between needs at least one bound")
            cols = (None if columns is None
                    else list(dict.fromkeys([*columns, col])))
            base = self._read_skipping(snap, cols, col, lo, hi)
            if lo is not None:
                base = base.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                base = base.filter(F.col(col) <= F.lit(hi))
        return base.filter(~F.col(SYS_DELETED)).filter(pred)

    def _pred_columns(self, fields: list[dict], key: str,
                      predicate) -> list[str]:
        """Key + the columns the predicate textually references — the
        narrow projection the probe action reads (an over-match only
        widens the read, never changes it)."""
        pred_s = (predicate if isinstance(predicate, str)
                  else str(predicate))
        return [f["name"] for f in fields
                if f["name"] == key
                or re.search(rf"\b{re.escape(f['name'])}\b", pred_s)]

    def _row_op_hits(self, snap: dict, predicate, columns=None,
                     between=None):
        """Live winners matching ``predicate`` plus their exact
        touched-bucket set and count (ONE narrow probe action — the
        same touched-hint seam cdc/apply.py uses, so the full source
        pipeline feeds exactly the merge write)."""
        key = self.key_field(snap)
        hits = self._row_op_base(snap, predicate, columns, between)
        probe = hits.select(
            self.bucket_expr(F.col(key)).alias("_b")
        ).agg(
            F.collect_set("_b").alias("_bs"),
            F.count(F.lit(1)).alias("_n"),
        ).collect()[0]
        return hits, set(probe["_bs"]), int(probe["_n"])

    def delete_where(
        self,
        predicate,
        mode: str = "delta",
        batch_id: str | None = None,
        wap_id: str | None = None,
        between: tuple | None = None,
    ) -> dict:
        """Predicate row-level delete (Iceberg ``DELETE FROM t WHERE
        p`` — the GDPR/right-to-erasure shape: 'delete every row for
        host X'). ``predicate`` is a SQL string or a Column over the
        data columns.

        Implementation: ONE event-channel merge — the matching live
        winners become tombstones stamped at each row's OWN current
        LSN. That is sound on both rules the engine reconciles with:
        the max-``(lsn, deleted)`` winner orders ``deleted=true``
        above ``false`` at equal LSN, so the tombstone wins now, and
        the change feed's strictly-greater diff sees ``(lsn, true) >
        (lsn, false)``, so downstream consumers (mirrors, IVM,
        envelope topics) receive ordinary delete events. Precedence
        vs the upstream source is exactly CDC-correct with no fence:
        any later source event carries a strictly higher LSN and wins
        (the delete is a lake-side correction, not a fork of history),
        while redelivered/stale events at or below the row's LSN stay
        dead under the same tie rule.

        Tombstones carry NO payload (non-key columns null) — the
        delete never re-persists the deleted values into its own
        commit files. Physical erasure follows the normal lake
        lifecycle: ``mode="cow"`` rewrites the touched buckets
        immediately (the old files become unreferenced);
        ``mode="delta"`` is O(matched) and defers the rewrite to
        ``compact()``. Either way the superseded bytes are reclaimed
        by ``expire_snapshots()`` + ``remove_orphans()`` — the same
        recipe Iceberg documents for erasure compliance.

        The scan is pruned to the key + the predicate's columns
        (textual match against field names — an over-match only
        widens the read); the merge gets the exact touched-bucket
        hint, so the whole op is one narrow probe + one merge write.
        ``between=(col, lo, hi)`` ADDITIONALLY bounds the scan by
        manifest stats (the ``read(between=...)`` machinery): on a
        table compacted sorted/Z-ordered on a time column, the usual
        'erase host X's pages from window W' correction plans
        O(window) files instead of scanning the table — the predicate
        still applies exactly on top, so the bound is an optimization,
        never a semantics change.
        Composes with the rest of the table: ``batch_id`` gives
        exactly-once under retry, ``wap_id`` stages the delete for
        write-audit-publish, branches take it unchanged."""
        snap = self.snapshot()
        if batch_id is not None and self.is_applied(batch_id, snap):
            return {"skipped": True, "version": snap["version"],
                    "deleted_rows": 0}
        key = self.key_field(snap)
        fields = self.fields(snap)
        pred_s = (predicate if isinstance(predicate, str)
                  else str(predicate))
        cols = self._pred_columns(fields, key, predicate)
        hits, touched, n = self._row_op_hits(snap, predicate, cols,
                                             between)
        if n == 0:
            return {"skipped": True, "version": snap["version"],
                    "deleted_rows": 0}
        src = hits.select(
            F.col(key),
            *[F.lit(None).cast(_spark_type(f["type"])).alias(f["name"])
              for f in fields if f["name"] != key],
            F.col(SYS_LSN).alias("lsn"),
            F.lit("D").alias("op"),
        )
        res = self.merge(
            src, batch_id=batch_id,
            lineage={"row_op": "delete_where", "predicate": pred_s,
                     "matched_rows": n},
            touched_hint=touched, mode=mode, source_unique=True,
            wap_id=wap_id)
        return {**res, "deleted_rows": n}

    def update_where(
        self,
        predicate,
        assignments: dict,
        mode: str = "delta",
        batch_id: str | None = None,
        wap_id: str | None = None,
        at_lsn: int | None = None,
        between: tuple | None = None,
    ) -> dict:
        """Predicate row-level update (Iceberg ``UPDATE t SET ...
        WHERE p``): rewrite the matching live winners with
        ``assignments`` (column -> SQL string or Column, evaluated
        over the old row — ``{"lang": "'en'"}``, ``{"text":
        F.upper("text")}``).

        Unlike ``delete_where`` an update cannot ride the row's own
        LSN — two non-deleted payloads at one ``(key, lsn)`` is
        exactly the ambiguity the engine's ordering forbids — so the
        corrected rows are stamped at a **fence LSN** = (highest LSN
        stored anywhere in the table) + 1, computed from manifest
        stats (metadata-only, see ``_max_applied_lsn``). Semantics:
        the correction beats everything the lake has seen, and any
        later upstream event with a strictly higher LSN beats the
        correction — the source stays the eventual source of truth,
        which is the standard CDC-sink correction contract.

        The one LSN the upstream log could still mint that would tie
        with the correction is the fence value itself. The commit
        therefore records ``[fence_lsn, version]`` in the snapshot's
        ``correction_fences``, and the apply path
        (``cdc/apply.py``) checks each incoming batch against the
        fences — an event AT a fence LSN for a key that correction
        touched raises ``CorrectionFenceCollision`` before the merge
        runs (events at that LSN for other keys pass: the guard
        semi-joins the correction commit's own rows). In practice
        corrections run quiesced — between micro-batches or from the
        ``--maintain`` job — and real WAL positions advance by record
        bytes, so the guard is a tripwire, not a cost: zero overhead
        until a fence exists.

        ``at_lsn`` overrides the fence (must exceed every stored
        LSN) for operators who reserve correction LSN ranges.
        The key column cannot be assigned (delete + upstream
        re-insert is the rename-a-key path). Feed/mirror/IVM
        consumers see ordinary ``update_preimage``/``postimage``
        events; ``mode``/``batch_id``/``wap_id`` as in
        ``delete_where``."""
        snap = self.snapshot()
        if batch_id is not None and self.is_applied(batch_id, snap):
            return {"skipped": True, "version": snap["version"],
                    "updated_rows": 0}
        key = self.key_field(snap)
        fields = self.fields(snap)
        names = {f["name"] for f in fields}
        if not assignments:
            raise ValueError("update_where needs at least one "
                             "assignment")
        if key in assignments:
            raise ValueError(
                f"cannot assign the key column {key!r} — delete the "
                f"row and re-insert under the new key upstream")
        unknown = set(assignments) - names
        if unknown:
            raise ValueError(f"unknown columns: {sorted(unknown)}")
        maxl = self._max_applied_lsn(snap)
        fence = int(at_lsn) if at_lsn is not None else maxl + 1
        if fence <= maxl:
            raise ValueError(
                f"at_lsn={fence} does not exceed the highest stored "
                f"LSN {maxl} — the correction would not win "
                f"reconciliation")
        pred_s = (predicate if isinstance(predicate, str)
                  else str(predicate))
        sets = {c: (F.expr(v) if isinstance(v, str) else v)
                for c, v in assignments.items()}
        # probe narrow (key + predicate columns only — the payload
        # must not cross the scan twice); the merge source reads full
        # width separately, feeding exactly the one write action
        _hits, touched, n = self._row_op_hits(
            snap, predicate, self._pred_columns(fields, key, predicate),
            between)
        if n == 0:
            return {"skipped": True, "version": snap["version"],
                    "updated_rows": 0}
        hits = self._row_op_base(snap, predicate, None, between)
        src = hits.select(
            *[(sets[f["name"]].cast(_spark_type(f["type"]))
               .alias(f["name"])
               if f["name"] in sets else F.col(f["name"]))
              for f in fields],
            F.lit(fence).cast("long").alias("lsn"),
            F.lit("U").alias("op"),
        )
        res = self.merge(
            src, batch_id=batch_id,
            lineage={"row_op": "update_where", "predicate": pred_s,
                     "assignments": {c: str(v) for c, v
                                     in assignments.items()},
                     "fence_lsn": fence, "matched_rows": n},
            touched_hint=touched, mode=mode, source_unique=True,
            wap_id=wap_id, add_correction_fence=fence)
        return {**res, "updated_rows": n, "fence_lsn": fence}

    def _guard_correction_fences(self, snap: dict, src: DataFrame,
                                 fences: dict[int, int]) -> None:
        """Refuse the one genuinely ambiguous event: a NON-delete
        source row at a correction fence LSN for a key that correction
        rewrote (two different payloads at one (key, lsn) — see
        ``update_where``). Lives on the MERGE itself so every event
        channel is covered — the streaming apply, envelope-topic
        replicas, mirrors, bootstrap — not just one consumer. Delete
        events at a fence are exempt: the (lsn, deleted) ordering
        resolves them deterministically (tombstone outranks the
        correction at its own LSN — matching source intent), and
        ``delete_where`` itself tombstones corrected rows at their
        fence LSN through this same code path.

        Cost: one narrow probe action per merge, only on tables where
        a correction ever ran (no fences -> never called); the probe
        prunes to (key, lsn, deleted), so the source pipeline's
        payload work does not rerun."""
        key = self.key_field(snap)
        hit = (src.filter(
            F.col(SYS_LSN).isin([int(x) for x in fences])
            & ~F.col(SYS_DELETED))
            .groupBy(SYS_LSN).agg(F.count(F.lit(1)).alias("_n"))
            .collect())
        for r in hit:
            lsn = int(r[SYS_LSN])
            corrected = self._correction_keys(fences[lsn], lsn)
            if corrected is None:
                raise CorrectionFenceCollision(
                    f"batch carries events at correction-fence LSN "
                    f"{lsn} (commit v{fences[lsn]}), and that "
                    f"commit's files were expired — the corrected key "
                    f"set is unknowable; resolve manually (re-run the "
                    f"correction above this LSN or drop the event)")
            n = (src.filter((F.col(SYS_LSN) == lsn)
                            & ~F.col(SYS_DELETED))
                 .select(F.col(key))
                 .join(corrected, key, "left_semi")
                 .count())
            if n:
                raise CorrectionFenceCollision(
                    f"batch carries {n} event(s) at LSN {lsn} for "
                    f"key(s) a lake-side correction (commit "
                    f"v{fences[lsn]}) stamped at that same LSN — "
                    f"max-(lsn, deleted) reconciliation cannot order "
                    f"two payloads at one (key, lsn); re-run the "
                    f"correction on top of the new event "
                    f"(update_where again) or drop the event, then "
                    f"resume the stream")

    def _correction_keys(self, version: int,
                         fence_lsn: int) -> DataFrame | None:
        """Key column of the rows a correction commit stamped at its
        fence LSN — the exact set the fence-collision guard must
        check (a COW correction's manifest also carries carried-over
        bucket rows; filtering on ``_lsn == fence`` isolates the
        corrected ones in both modes). Returns None when the commit's
        files were expired — the guard then raises conservatively."""
        lin = self._lineage_entry(version) or {}
        man_path = (lin.get("commit_manifest")
                    or self._manifest_path(version))
        if not os.path.exists(man_path):
            return None
        with open(man_path) as f:
            man = json.load(f)
        entries = [e for g in man["files"].values() for e in g]
        if not entries or any(not os.path.exists(e["path"])
                              for e in entries):
            return None
        key = self.key_field()
        key_fld = [f for f in self.fields() if f["name"] == key]
        return (self._read_entries(key_fld, entries)
                .filter(F.col(SYS_LSN) == int(fence_lsn))
                .select(key))

    # --------------------------------------------- write-audit-publish

    @property
    def staged_dir(self) -> str:
        return os.path.join(self.meta_dir, "staged")

    def _staged_path(self, wap_id: str) -> str:
        if not self._REF_NAME_RE.match(wap_id):
            raise ValueError(
                f"invalid wap_id {wap_id!r} (want [A-Za-z0-9._-], "
                f"letter/digit first, <=64 chars)")
        return os.path.join(self.staged_dir, f"wap-{wap_id}.json")

    def _staged_manifest_path(self, wap_id: str) -> str:
        return os.path.join(
            self.staged_dir, f"manifest-wap-{wap_id}.json")

    def _write_staged(self, wap_id: str, rec: dict) -> None:
        os.makedirs(self.staged_dir, exist_ok=True)
        path = self._staged_path(wap_id)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise ValueError(
                f"wap_id {wap_id!r} already has a staged commit — "
                f"publish or abort it first") from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def _staged_rec(self, wap_id: str) -> dict:
        path = self._staged_path(wap_id)
        if not os.path.exists(path):
            raise ValueError(f"no staged commit for wap_id {wap_id!r}")
        with open(path) as f:
            return json.load(f)

    def staged(self) -> dict[str, dict]:
        """All staged (unpublished) WAP commits, wap_id -> summary."""
        if not os.path.isdir(self.staged_dir):
            return {}
        out: dict[str, dict] = {}
        for fn in sorted(os.listdir(self.staged_dir)):
            if fn.startswith("wap-") and fn.endswith(".json"):
                with open(os.path.join(self.staged_dir, fn)) as f:
                    rec = json.load(f)
                out[rec["wap_id"]] = {
                    "base_version": rec["base_version"],
                    "batch_id": rec["batch_id"],
                    "staged_at": rec["staged_at"],
                    "merged_rows": rec["lineage"]["merged_rows"],
                }
        return out

    def read_staged(
        self,
        wap_id: str,
        columns: list[str] | None = None,
        between: tuple | None = None,
    ) -> DataFrame:
        """The audit read: live rows of the CANDIDATE state the staged
        commit would produce if published — same semantics and options
        as ``read()``. Quality gates (row-count deltas, null-rate
        checks, dedup-rate bounds) run against this before deciding to
        ``publish_staged`` or ``abort_staged``."""
        return self._read_snap(
            self._staged_rec(wap_id)["snap"], columns, between)

    def publish_staged(self, wap_id: str) -> dict:
        """Promote a staged WAP commit to the table's next snapshot —
        metadata only, the audited files ARE the published files.
        Requires the table to still be at the staged commit's base
        version: the candidate's winner decision and manifest layering
        were computed against that exact state, so an intervening
        commit means the audit proved the wrong thing — fail with
        CommitConflict and re-stage on the new base (Iceberg
        cherry-pick has the same ancestry guard). Publishing a batch
        the table meanwhile applied through another path degrades to
        an abort (exactly-once holds across the WAP seam).

        The staged manifest is ADOPTED into the numbered manifest
        chain (hard-linked to ``manifest-<version>.json``) and every
        snapshot pointer rewritten to the numbered path BEFORE the
        snapshot commits. Committed snapshots therefore never
        reference a ``staged/`` path — so a later re-use of the same
        ``wap_id`` (a recurring 'nightly-audit' id) re-stages into a
        filename nothing committed depends on, and ``abort_staged``
        can always delete staged metadata without breaking committed
        reads."""
        rec = self._staged_rec(wap_id)
        cur = self.current_version()
        if rec["batch_id"] is not None and self.is_applied(rec["batch_id"]):
            # applied through another path (or this publish's own
            # crashed earlier attempt) — the staged record is obsolete;
            # abort_staged's referenced-file guard keeps any file a
            # committed snapshot adopted
            self.abort_staged(wap_id, keep_files=False)
            return {"skipped": True, "version": cur}
        if cur != rec["base_version"]:
            raise CommitConflict(
                f"staged wap {wap_id!r} was audited against "
                f"v{rec['base_version']} but the table is at v{cur} — "
                f"abort and re-stage on the current state")
        snap2 = rec["snap"]
        version = snap2["version"]
        staged_man = self._staged_manifest_path(wap_id)
        # adopt the staged manifest into the chain at a UNIQUE path
        # (hard link — the staged copy is removed after commit), so a
        # crashed or raced publish leaves only inert residue and can
        # never clobber a rival's manifest
        man_path = os.path.join(
            self.meta_dir,
            f"manifest-{version:08d}-{uuid.uuid4().hex[:12]}.json")
        os.link(staged_man, man_path)
        snap2["manifests"] = {
            b: [man_path if p == staged_man else p for p in lst]
            for b, lst in snap2["manifests"].items()
        }
        snap2["committed_at"] = time.time()
        lin = {**rec["lineage"], "wap_id": wap_id,
               "commit_manifest": man_path}
        snap2["lineage"] = lin
        self._write_snapshot(snap2)
        self._append_lineage(version, lin)
        os.remove(self._staged_path(wap_id))
        try:
            os.remove(staged_man)  # the numbered hard link remains
        except OSError:
            pass
        return {
            "skipped": False,
            "version": snap2["version"],
            "merged_rows": rec["lineage"]["merged_rows"],
            "wap_id": wap_id,
        }

    def abort_staged(self, wap_id: str, keep_files: bool = False) -> dict:
        """Drop a staged commit. With ``keep_files=False`` (default)
        the staged merge's own data files are deleted immediately —
        except any file a committed snapshot references (a crashed
        publish may have adopted this staging's manifest before its
        cleanup ran; the reference check is one driver-side metadata
        scan and only runs when there are files to consider).
        ``keep_files=True`` leaves them as unreferenced residue for
        forensics; ``remove_orphans`` reclaims them on the normal
        maintenance cadence."""
        rec = self._staged_rec(wap_id)
        staged_man = self._staged_manifest_path(wap_id)
        removed = 0
        if not keep_files and os.path.exists(staged_man):
            with open(staged_man) as f:
                man = json.load(f)
            own = {e["path"] for group in man["files"].values()
                   for e in group}
            if own:
                referenced: set[str] = set()
                for fn in os.listdir(self.meta_dir):
                    if not (fn.startswith("snap-")
                            and fn.endswith(".json")):
                        continue
                    with open(os.path.join(self.meta_dir, fn)) as f:
                        snap = json.load(f)
                    for e in self.files(snap):
                        referenced.add(e["path"])
                for p in own - referenced:
                    try:
                        os.remove(p)
                        removed += 1
                    except OSError:
                        pass
        os.remove(self._staged_path(wap_id))
        try:
            os.remove(staged_man)
        except OSError:
            pass
        return {"aborted": wap_id, "base_version": rec["base_version"],
                "removed_files": removed}

    def _staged_file_paths(self) -> set[str]:
        """Data files referenced only by staged (unpublished) WAP
        commits — protected from expire/GC until published/aborted."""
        out: set[str] = set()
        for wap_id in self.staged():
            for e in self.files(self._staged_rec(wap_id)["snap"]):
                out.add(e["path"])
        return out
