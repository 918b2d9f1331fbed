"""Engine option surface — parity with the reference's de-facto API
contract (ref config/LanceOptions.java, defaults and validation rules
:719-780 — positive batch sizes, limit >= 0, num_bits 1..16, positive
IVF/HNSW parameters).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class WriteMode(str, Enum):
    """ref config/LanceOptions.java:264-286."""

    APPEND = "append"
    OVERWRITE = "overwrite"

    @classmethod
    def parse(cls, s: "str | WriteMode") -> "WriteMode":
        if isinstance(s, WriteMode):
            return s
        try:
            return cls(s.lower())
        except ValueError:
            raise ValueError(f"unknown write mode {s!r}; expected append|overwrite") from None


class DistanceMetric(str, Enum):
    """ref config/LanceOptions.java:323-346."""

    L2 = "l2"
    COSINE = "cosine"
    DOT = "dot"

    @classmethod
    def parse(cls, s: "str | DistanceMetric") -> "DistanceMetric":
        if isinstance(s, DistanceMetric):
            return s
        try:
            return cls(s.lower())
        except ValueError:
            raise ValueError(f"unknown metric {s!r}; expected l2|cosine|dot") from None


class IndexType(str, Enum):
    """ref config/LanceOptions.java / LanceIndexBuilder.java:125-166."""

    IVF_PQ = "ivf_pq"
    IVF_HNSW_PQ = "ivf_hnsw_pq"
    IVF_FLAT = "ivf_flat"

    @classmethod
    def parse(cls, s: "str | IndexType") -> "IndexType":
        if isinstance(s, IndexType):
            return s
        try:
            return cls(s.lower())
        except ValueError:
            raise ValueError(f"unknown index type {s!r}") from None


S3_SCHEMES = ("s3://", "s3a://", "s3n://")


def is_s3_path(path: str) -> bool:
    """Path-scheme detection (ref table/LanceCatalogS3Test.java:165-355
    unit surface; the reference routes s3:// warehouses to the S3-backed
    catalog, everything else to the local filesystem)."""
    return path.lower().startswith(S3_SCHEMES)


@dataclass
class S3Options:
    """Catalog S3 credentials/endpoint options with the reference's
    defaults (ref table/LanceCatalogFactory.java:77-111): s3-access-key,
    s3-secret-key, s3-region, s3-endpoint, s3-virtual-hosted-style=true,
    s3-allow-http=false."""

    access_key: str | None = None
    secret_key: str | None = None
    region: str | None = None
    endpoint: str | None = None
    virtual_hosted_style: bool = True
    allow_http: bool = False

    KEYS = {
        "s3-access-key": "access_key",
        "s3-secret-key": "secret_key",
        "s3-region": "region",
        "s3-endpoint": "endpoint",
        "s3-virtual-hosted-style": "virtual_hosted_style",
        "s3-allow-http": "allow_http",
    }

    @classmethod
    def from_dict(cls, opts: dict) -> "S3Options | None":
        """Build from connector-style keys; None when no s3-* key present."""
        kwargs = {}
        for k, attr in cls.KEYS.items():
            if k in opts and opts[k] is not None:
                v = opts[k]
                if attr in ("virtual_hosted_style", "allow_http") and isinstance(v, str):
                    v = v.strip().lower() in ("true", "1", "yes")
                kwargs[attr] = v
        return cls(**kwargs) if kwargs else None

    def to_option_map(self) -> dict:
        """Back to connector-style ``s3-*`` keys — for threading the
        credentials through DataFrame reader options (the catalog's S3
        read path hands them to ``spark.read.format("lance")``)."""
        out: dict = {}
        for key, attr in self.KEYS.items():
            v = getattr(self, attr)
            if v is not None:
                out[key] = str(v).lower() if isinstance(v, bool) else str(v)
        return out

    def to_storage_options(self) -> dict:
        """Map to the aws_* storage-option names the Lance native layer
        consumes (ref table/LanceCatalogFactory.java:148-176 mapping,
        applied at table/LanceCatalog.java:743-773)."""
        out: dict = {}
        if self.access_key:
            out["aws_access_key_id"] = self.access_key
        if self.secret_key:
            out["aws_secret_access_key"] = self.secret_key
        if self.region:
            out["aws_region"] = self.region
        if self.endpoint:
            out["aws_endpoint"] = self.endpoint
        out["virtual_hosted_style_request"] = str(self.virtual_hosted_style).lower()
        out["allow_http"] = str(self.allow_http).lower()
        return out


@dataclass
class DatasetOptions:
    """All reference options with their defaults (ref config/LanceOptions.java):

    path (:45-49, required) | read.batch-size=1024 (:56-60) |
    read.limit (:65-69) | read.columns (:74-78) | read.filter (:83-87) |
    write.batch-size=1024 (:94-98) | write.mode=append (:103-107) |
    write.max-rows-per-file=1000000 (:112-116) | index.* (:123-190) |
    vector.* (:197-237) | default-database/warehouse (:244-257).

    Beyond the reference (datasource-level, parsed by the format
    reader): read.max-rows-per-partition (split packing),
    read.delta-from-version / read.delta-allow-rewrites (incremental
    batch), read.file-column (row->fragment attribution),
    read.verify-integrity (per-scan sha256 check of every fragment
    against its write-time digest — loud IntegrityError on mismatch,
    skip when unstamped).
    """

    path: str = ""
    read_batch_size: int = 1024
    read_limit: int | None = None
    read_columns: list[str] | None = None
    read_filter: str | None = None
    write_batch_size: int = 1024
    write_mode: WriteMode = WriteMode.APPEND
    write_max_rows_per_file: int = 1_000_000
    # beyond-reference: opt-in append-time schema evolution (the reference
    # sink is static-schema); mirrors Spark's mergeSchema opt-in contract
    schema_evolution: bool = False
    # beyond-reference: per-fragment bloom filters on these columns for
    # point-predicate data skipping (sources/bloom.py); int/str columns only
    bloom_columns: list[str] = field(default_factory=list)
    # beyond-reference: ingest-time layout. write.sort-by sorts rows
    # WITHIN each task partition (zero shuffle — tight parquet row-group
    # stats for row-group pruning); write.cluster=true additionally
    # range-partitions on those columns first (ONE shuffle — disjoint
    # per-fragment zone maps, so point/range filters prune whole
    # fragments at planning time without a later cluster_dataset rewrite)
    sort_columns: list[str] = field(default_factory=list)
    cluster_on_write: bool = False
    # beyond-reference: page layout of NATIVE (binary v2) writes —
    # "2.0" (fixture-pinned per-column pages) or "2.1-miniblock"
    # (chunked structural pages with definition levels for fixed-width
    # columns; see lance_format._decode_miniblock's reconstruction
    # contract). Read-side support is automatic per page.
    native_layout: str = "2.0"
    # write.native-compression: compression of 2.1 mini-block VALUE
    # streams — "none", "zlib" (stdlib per-chunk blocks; floats
    # additionally byte-stream-split so same-position bytes compress
    # together) or "fsst" (per-page symbol table over string/binary
    # columns, per-string substitution streams preserving random
    # access; sources/fsst.py). Requires native_layout='2.1-miniblock';
    # level streams stay flat so chunk skipping never decompresses what
    # it skips.
    native_compression: str = "none"
    index_type: IndexType = IndexType.IVF_PQ
    index_column: str | None = None
    index_num_partitions: int = 256
    index_num_sub_vectors: int | None = None
    index_num_bits: int = 8
    index_max_level: int = 7
    index_m: int = 16
    index_ef_construction: int = 100
    vector_column: str | None = None
    vector_metric: DistanceMetric = DistanceMetric.L2
    vector_nprobes: int = 20
    vector_ef: int = 100
    vector_refine_factor: int | None = None
    default_database: str = "default"
    warehouse: str | None = None
    s3: "S3Options | None" = None
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.write_mode = WriteMode.parse(self.write_mode)
        self.vector_metric = DistanceMetric.parse(self.vector_metric)
        self.index_type = IndexType.parse(self.index_type)
        self.validate()

    def validate(self) -> None:
        """ref config/LanceOptions.java:719-780."""
        if self.read_batch_size <= 0:
            raise ValueError("read.batch-size must be positive")
        if self.write_batch_size <= 0:
            raise ValueError("write.batch-size must be positive")
        if self.read_limit is not None and self.read_limit < 0:
            raise ValueError("read.limit must be >= 0")
        if self.write_max_rows_per_file <= 0:
            raise ValueError("write.max-rows-per-file must be positive")
        if self.native_layout not in ("2.0", "2.1-miniblock"):
            raise ValueError(
                "write.native-layout must be '2.0' or '2.1-miniblock' "
                f"(got {self.native_layout!r})")
        if self.native_compression not in ("none", "zlib", "fsst"):
            raise ValueError(
                "write.native-compression must be 'none', 'zlib' or "
                f"'fsst' (got {self.native_compression!r})")
        if self.native_compression != "none" and self.native_layout == "2.0":
            raise ValueError(
                "write.native-compression requires "
                "write.native-layout=2.1-miniblock (2.0 pages are "
                "fixture-pinned uncompressed)")
        if not (1 <= self.index_num_bits <= 16):
            raise ValueError("index.num-bits must be in [1, 16]")
        for name in ("index_num_partitions", "index_max_level", "index_m",
                     "index_ef_construction", "vector_nprobes", "vector_ef"):
            if getattr(self, name) <= 0:
                raise ValueError(f"{name} must be positive")
        if self.index_num_sub_vectors is not None and self.index_num_sub_vectors <= 0:
            raise ValueError("index.num-sub-vectors must be positive")
        if self.vector_refine_factor is not None and self.vector_refine_factor <= 0:
            raise ValueError("vector.refine-factor must be positive")
        if self.cluster_on_write and not self.sort_columns:
            raise ValueError("write.cluster=true requires write.sort-by columns")

    @classmethod
    def from_dict(cls, opts: dict) -> "DatasetOptions":
        """Build from a 'connector options'-style string map
        (ref table/LanceDynamicTableFactory.java:204-236)."""
        key_map = {
            "path": "path",
            "read.batch-size": "read_batch_size",
            "read.limit": "read_limit",
            "read.columns": "read_columns",
            "read.filter": "read_filter",
            "write.batch-size": "write_batch_size",
            "write.mode": "write_mode",
            "write.max-rows-per-file": "write_max_rows_per_file",
            "write.schema-evolution": "schema_evolution",
            "write.bloom-columns": "bloom_columns",
            "write.sort-by": "sort_columns",
            "write.cluster": "cluster_on_write",
            "write.native-layout": "native_layout",
            "write.native-compression": "native_compression",
            "index.type": "index_type",
            "index.column": "index_column",
            "index.num-partitions": "index_num_partitions",
            "index.num-sub-vectors": "index_num_sub_vectors",
            "index.num-bits": "index_num_bits",
            "index.max-level": "index_max_level",
            "index.m": "index_m",
            "index.ef-construction": "index_ef_construction",
            "vector.column": "vector_column",
            "vector.metric": "vector_metric",
            "vector.nprobes": "vector_nprobes",
            "vector.ef": "vector_ef",
            "vector.refine-factor": "vector_refine_factor",
            "default-database": "default_database",
            "warehouse": "warehouse",
        }
        ints = {"read_batch_size", "read_limit", "write_batch_size",
                "write_max_rows_per_file", "index_num_partitions",
                "index_num_sub_vectors", "index_num_bits", "index_max_level",
                "index_m", "index_ef_construction", "vector_nprobes",
                "vector_ef", "vector_refine_factor"}
        kwargs: dict = {}
        extra: dict = {}
        for k, v in opts.items():
            if k in key_map:
                attr = key_map[k]
                if attr in ints and v is not None:
                    v = int(v)
                elif attr in ("schema_evolution", "cluster_on_write") and isinstance(v, str):
                    v = v.strip().lower() in ("true", "1", "yes")
                elif attr in ("read_columns", "bloom_columns", "sort_columns") \
                        and isinstance(v, str):
                    v = [c.strip() for c in v.split(",") if c.strip()]
                kwargs[attr] = v
            elif k in S3Options.KEYS:
                pass  # collected below
            else:
                extra[k] = v
        return cls(extra=extra, s3=S3Options.from_dict(opts), **kwargs)
