"""Remote-filesystem shim for the READ path of S3 warehouses.

The reference maps ``s3-*`` catalog options to object-store credentials
and hands them to the native Lance layer (ref
table/LanceCatalogFactory.java:148-176, applied at
table/LanceCatalog.java:743-773). The emulated parquet backend is
filesystem-based, so S3 support here is gated on ``fsspec``/``s3fs``
being importable:

- **metadata plane** (manifest listing/reads, table detection) goes
  through ``fsspec`` directly — a handful of tiny JSON reads;
- **data plane** reads go through the Python DataSource
  (``format("lance")``): its ``read()`` already runs inside Python
  workers over pyarrow, so each worker opens its fragment through
  ``fsspec`` with the mapped credentials — no JVM hadoop-aws jars
  needed, and the per-fragment partitioning / zone-map pruning are
  unchanged;
- **writes** are executor-direct: each task PUTs its fragment files
  straight to ``s3://…/data/`` through fsspec (writer._write_remote —
  data bytes never touch the driver), then the driver commits the
  manifest through ``create_exclusive`` — on s3fs an S3 conditional PUT
  (``If-None-Match: *``), giving the same single-winner semantics as
  the local ``O_EXCL`` path. Backends without exclusive-create keep
  the old clear refusal (a lost-update window is worse than an error);
- **maintenance** (DELETE/MERGE/compact) runs executor-direct too — a
  file-attributed probe plus a partition-pruned rescan whose tasks PUT
  rewritten fragments straight to s3 (sources/maintenance.py
  _delete_remote/_merge_remote/_compact_remote), and **vacuum**
  garbage-collects dead keys from listings alone (_vacuum_remote).

Without fsspec installed, every remote call degrades to the same clear
error the catalog always raised.
"""

from __future__ import annotations

_REMOTE_SCHEMES = ("s3://", "s3a://", "s3n://")


def is_remote(path: str) -> bool:
    return str(path).lower().startswith(_REMOTE_SCHEMES)


class RemoteUnavailableError(RuntimeError):
    def __init__(self, what: str = "this operation"):
        super().__init__(
            f"{what} on an S3 warehouse requires 'fsspec' + 's3fs' (pip "
            "install s3fs) for the emulated backend, or the native lance "
            "backend; neither is available"
        )


def _fsspec_kwargs(storage_options: dict | None) -> dict:
    """Map the reference-convention ``aws_*`` storage options
    (options.S3Options.to_storage_options) onto s3fs constructor kwargs.
    Unknown keys pass through untouched (test filesystems use them)."""
    o = dict(storage_options or {})
    kw: dict = {}
    client: dict = {}
    if "aws_access_key_id" in o:
        kw["key"] = o.pop("aws_access_key_id")
    if "aws_secret_access_key" in o:
        kw["secret"] = o.pop("aws_secret_access_key")
    if "aws_region" in o:
        client["region_name"] = o.pop("aws_region")
    if "aws_endpoint" in o:
        client["endpoint_url"] = o.pop("aws_endpoint")
    o.pop("virtual_hosted_style_request", None)  # s3fs default addressing
    if o.pop("allow_http", "false") == "true" and "endpoint_url" in client:
        client["use_ssl"] = False
    if client:
        kw["client_kwargs"] = client
    kw.update(o)
    return kw


def get_fs(path: str, storage_options: dict | None = None):
    """An fsspec filesystem for a remote path, or a clear error. All fs
    calls take FULL urls (s3fs strips the protocol itself)."""
    if not is_remote(path):
        raise ValueError(f"get_fs is for remote paths, got {path!r}")
    try:
        import fsspec
    except ImportError as e:
        raise RemoteUnavailableError(f"reading {path}") from e
    try:
        # fsspec.filesystem("s3") itself imports s3fs — wrap that too, or
        # an fsspec-without-s3fs install leaks a raw ImportError past the
        # promised clear refusal
        return fsspec.filesystem("s3", **_fsspec_kwargs(storage_options))
    except ImportError as e:
        raise RemoteUnavailableError(f"reading {path}") from e


def create_exclusive(fs, url: str, payload: bytes) -> None:
    """Atomic create-if-absent of one remote object — the primitive the
    single-winner commit protocol needs (the remote twin of the local
    ``O_CREAT|O_EXCL`` manifest write).

    Delegates to the filesystem's exclusive-write mode (``open(path,
    'xb')``): s3fs implements it with an S3 conditional PUT
    (``If-None-Match: *`` — S3's 2024 conditional-write API), so exactly
    one of N concurrent writers can create a given manifest key and the
    losers get ``FileExistsError`` (raised at close, when the PUT's
    precondition is evaluated). ``FileExistsError`` propagates to the
    caller's retry loop; a backend without exclusive-create support gets
    a clear refusal instead of a lost-update window."""
    try:
        f = fs.open(url, "xb")
    except FileExistsError:
        raise
    except (NotImplementedError, ValueError) as e:
        raise NotImplementedError(
            f"the filesystem backing {url} has no exclusive-create "
            "('xb' / If-None-Match) support — conditional commits are "
            "unavailable; upgrade s3fs or write through the native "
            "lance backend"
        ) from e
    with f:
        f.write(payload)


def remote_ls_names(fs, path: str) -> list[str]:
    """Base names of a remote directory's entries (s3fs.ls returns
    bucket-relative or protocol-full paths depending on version)."""
    try:
        entries = fs.ls(path, detail=False)
    except FileNotFoundError:
        return []
    return [str(e).rstrip("/").rsplit("/", 1)[-1] for e in entries]
