"""Server configuration file — the reference's YAML surface.

Mirrors server/config/config.go: the same document shape
(``log`` / ``storage.data_path`` / ``storage.catalog.type`` /
``storage.schema``), the same defaults (config.go:58-86
LoadDefaultConfig), the same validation errors (data_path required,
catalog type required — config.go:138-158), and the same fixed port
accessors (constants.go:7-26). ``gateway_from_config`` is the bridge
the reference's server.go performs at boot: data_path becomes the
engine warehouse, catalog.type/path select the durable catalog store,
and the protocol servers start on the configured (or fixed) ports.

The reference's log-rotation settings are accepted and surfaced but not
re-implemented — Spark's log4j owns logging here; the keys are
validated so a reference config file round-trips loss-free through
``save_config``.
"""

from __future__ import annotations

import dataclasses
import os

from ranger_spark.errors import RangerError

# server/config/errors.go (shape: component.kind)
CONFIG_READ_FAILED = "config.file_read_failed"
CONFIG_PARSE_FAILED = "config.file_parse_failed"
CONFIG_VALIDATION_FAILED = "config.validation_failed"
DATA_PATH_REQUIRED = "config.data_path_required"
CATALOG_TYPE_REQUIRED = "config.catalog_type_required"

# server/config/constants.go:7-26
HTTP_SERVER_PORT = 2847
JDBC_SERVER_PORT = 2848
NATIVE_SERVER_PORT = 2849
MINIO_SERVER_PORT = 2850
HEALTH_CHECK_PORT = 2851


@dataclasses.dataclass
class LogConfig:
    level: str = "info"
    format: str = "console"
    file_path: str = "logs/ranger-server.log"
    console: bool = True
    max_size: int = 100
    max_backups: int = 3
    max_age: int = 7
    cleanup: bool = True


@dataclasses.dataclass
class CatalogConfig:
    type: str = "json"
    path: str = ""  # sqlite path / REST base url (repo extension)

    def validate(self) -> None:
        if not self.type:
            raise RangerError(
                CATALOG_TYPE_REQUIRED, "catalog type is required"
            )
        if self.type not in ("json", "sqlite", "rest"):
            raise RangerError(
                CONFIG_VALIDATION_FAILED,
                f"unknown catalog type {self.type!r} "
                "(expected json, sqlite or rest)",
            )


@dataclasses.dataclass
class SchemaManagerConfig:
    cache_ttl_minutes: int = 5
    max_cache_size: int = 1000
    stats_interval_secs: int = 60
    enable_metrics: bool = True
    enable_lru: bool = True


@dataclasses.dataclass
class StorageConfig:
    data_path: str = "./data"
    catalog: CatalogConfig = dataclasses.field(default_factory=CatalogConfig)
    schema: SchemaManagerConfig = dataclasses.field(
        default_factory=SchemaManagerConfig
    )

    def validate(self) -> None:
        if not self.data_path:
            raise RangerError(
                DATA_PATH_REQUIRED,
                "data_path is required in storage configuration",
            )
        self.catalog.validate()


@dataclasses.dataclass
class RangerConfig:
    log: LogConfig = dataclasses.field(default_factory=LogConfig)
    storage: StorageConfig = dataclasses.field(default_factory=StorageConfig)

    def validate(self) -> None:
        self.storage.validate()

    # fixed port accessors (config.go:169-197 / constants.go)
    def http_port(self) -> int:
        return HTTP_SERVER_PORT

    def jdbc_port(self) -> int:
        return JDBC_SERVER_PORT

    def native_port(self) -> int:
        return NATIVE_SERVER_PORT

    def minio_port(self) -> int:
        return MINIO_SERVER_PORT

    def health_check_port(self) -> int:
        return HEALTH_CHECK_PORT

    def storage_path(self) -> str:
        return self.storage.data_path

    def catalog_type(self) -> str:
        return self.storage.catalog.type


def _build(cls, data: dict):
    """Populate a dataclass from a (possibly partial) mapping, keeping
    the reference's defaults for absent keys and ignoring unknown keys
    (yaml.v3 Unmarshal semantics)."""
    if not isinstance(data, dict):
        raise RangerError(
            CONFIG_PARSE_FAILED,
            f"expected a mapping for {cls.__name__}, got {type(data).__name__}",
        )
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data or data[f.name] is None:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) or f.name in ("catalog", "schema"):
            sub = {"catalog": CatalogConfig, "schema": SchemaManagerConfig}[
                f.name
            ]
            kwargs[f.name] = _build(sub, v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def load_default_config() -> RangerConfig:
    """config.go:58-86 LoadDefaultConfig parity."""
    return RangerConfig()


def load_config(path: str) -> RangerConfig:
    """config.go:88-109 LoadConfig parity: read, parse, validate."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover — ships in this env
        raise RangerError(
            CONFIG_PARSE_FAILED, "pyyaml is required to load config files"
        ) from e
    try:
        with open(path) as fh:
            raw = fh.read()
    except OSError as e:
        raise RangerError(
            CONFIG_READ_FAILED, f"failed to read config file: {e}"
        ) from e
    try:
        doc = yaml.safe_load(raw) or {}
    except yaml.YAMLError as e:
        raise RangerError(
            CONFIG_PARSE_FAILED, f"failed to parse config file: {e}"
        ) from e
    cfg = RangerConfig()
    if "log" in doc and doc["log"] is not None:
        cfg.log = _build(LogConfig, doc["log"])
    if "storage" in doc and doc["storage"] is not None:
        s = doc["storage"]
        # an EXPLICIT empty data_path must reach validation (the
        # reference errors on it); only an absent key takes the default
        dp = (
            s["data_path"]
            if "data_path" in s and s["data_path"] is not None
            else StorageConfig().data_path
        )
        cfg.storage = StorageConfig(
            data_path=dp,
            catalog=_build(CatalogConfig, s.get("catalog") or {}),
            schema=_build(SchemaManagerConfig, s.get("schema") or {}),
        )
    # The reference's shipped ranger-server.yml carries a TOP-LEVEL
    # catalog section, but its Config struct (server/config/config.go:11-15)
    # has no such field — yaml.v3 silently IGNORES it, so the reference
    # resolves storage.catalog ('json') from that file. Match that:
    # the top-level section is honored only as a repo extension when
    # storage.catalog was not given at all (divergence documented here).
    if (
        "catalog" in doc
        and doc["catalog"] is not None
        and not (
            isinstance(doc.get("storage"), dict)
            and doc["storage"].get("catalog") is not None
        )
    ):
        cfg.storage.catalog = _build(CatalogConfig, doc["catalog"])
    cfg.validate()
    return cfg


def save_config(cfg: RangerConfig, path: str) -> None:
    """config.go:111-123 SaveConfig parity."""
    import yaml

    doc = {
        "log": dataclasses.asdict(cfg.log),
        "storage": {
            "data_path": cfg.storage.data_path,
            "catalog": dataclasses.asdict(cfg.storage.catalog),
            "schema": dataclasses.asdict(cfg.storage.schema),
        },
    }
    with open(path, "w") as fh:
        yaml.safe_dump(doc, fh, sort_keys=False)


def gateway_from_config(spark, path: str, ephemeral_ports: bool = False):
    """Boot the protocol gateway from a reference-shape config file —
    the server.go composition: data_path → warehouse, catalog type/path
    → durable store confs, fixed protocol ports (or ephemeral for
    tests). Returns the started Gateway."""
    from ranger_spark.engine import Engine
    from ranger_spark.gateway import Gateway

    cfg = load_config(path)
    os.makedirs(cfg.storage.data_path, exist_ok=True)
    # spark.sql.warehouse.dir is static on a live session; the engine
    # honors this runtime override (engine._warehouse)
    spark.conf.set(
        "spark.ranger.warehouse.dir", os.path.abspath(cfg.storage.data_path)
    )
    spark.conf.set("spark.ranger.catalog.type", cfg.storage.catalog.type)
    if cfg.storage.catalog.path:
        spark.conf.set("spark.ranger.catalog.uri", cfg.storage.catalog.path)
    kw = (
        dict(http_port=0, jdbc_port=0, native_port=0)
        if ephemeral_ports
        else dict(
            http_port=cfg.http_port(),
            jdbc_port=cfg.jdbc_port(),
            native_port=cfg.native_port(),
        )
    )
    return Gateway(Engine(spark), **kw).start()
