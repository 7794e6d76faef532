"""Server configuration: CLI flags > MEILI_* env vars > config.toml.

Reference: crates/meilisearch/src/option.rs (the `Opt` struct, 82 fields,
env prefix mapping at option.rs:28-108) — the subset that affects behavior
in this engine is implemented; unknown config keys are accepted and kept in
`extra` so workload configs parse.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class Opt:
    db_path: str = "./data.ms"
    http_addr: str = "localhost:7700"
    master_key: Optional[str] = None
    env: str = "development"
    import_dump: Optional[str] = None
    import_snapshot: Optional[str] = None
    schedule_snapshot: Optional[int] = None  # seconds
    snapshot_dir: str = "snapshots/"
    dump_dir: str = "dumps/"
    max_indexing_memory: Optional[str] = None
    max_indexing_threads: Optional[int] = None
    http_payload_size_limit: str = "100 MB"
    log_level: str = "INFO"
    no_analytics: bool = True
    experimental_enable_metrics: bool = False
    experimental_personalization_api_key: Optional[str] = None
    extra: dict = field(default_factory=dict)

    @property
    def host(self) -> str:
        return self.http_addr.rsplit(":", 1)[0] or "127.0.0.1"

    @property
    def port(self) -> int:
        try:
            return int(self.http_addr.rsplit(":", 1)[1])
        except (IndexError, ValueError):
            return 7700


_ENV_MAP = {
    "MEILI_DB_PATH": "db_path",
    "MEILI_HTTP_ADDR": "http_addr",
    "MEILI_MASTER_KEY": "master_key",
    "MEILI_ENV": "env",
    "MEILI_IMPORT_DUMP": "import_dump",
    "MEILI_IMPORT_SNAPSHOT": "import_snapshot",
    "MEILI_SCHEDULE_SNAPSHOT": "schedule_snapshot",
    "MEILI_SNAPSHOT_DIR": "snapshot_dir",
    "MEILI_DUMP_DIR": "dump_dir",
    "MEILI_MAX_INDEXING_MEMORY": "max_indexing_memory",
    "MEILI_MAX_INDEXING_THREADS": "max_indexing_threads",
    "MEILI_HTTP_PAYLOAD_SIZE_LIMIT": "http_payload_size_limit",
    "MEILI_LOG_LEVEL": "log_level",
    "MEILI_NO_ANALYTICS": "no_analytics",
    "MEILI_EXPERIMENTAL_ENABLE_METRICS": "experimental_enable_metrics",
    "MEILI_EXPERIMENTAL_PERSONALIZATION_API_KEY": (
        "experimental_personalization_api_key"
    ),
}


def load_options(argv: Optional[list[str]] = None) -> Opt:
    parser = argparse.ArgumentParser(prog="meilisearch-tpu")
    parser.add_argument("--db-path")
    parser.add_argument("--http-addr")
    parser.add_argument("--host")  # convenience split form
    parser.add_argument("--port", type=int)
    parser.add_argument("--master-key")
    parser.add_argument("--env", choices=["development", "production"])
    parser.add_argument("--import-dump")
    parser.add_argument("--import-snapshot")
    parser.add_argument("--schedule-snapshot", type=int, nargs="?", const=86400)
    parser.add_argument("--snapshot-dir")
    parser.add_argument("--dump-dir")
    parser.add_argument("--max-indexing-memory")
    parser.add_argument("--max-indexing-threads", type=int)
    parser.add_argument("--log-level")
    parser.add_argument("--no-analytics", action="store_true", default=None)
    parser.add_argument("--experimental-enable-metrics", action="store_true", default=None)
    parser.add_argument("--experimental-personalization-api-key")
    parser.add_argument("--config-file-path")
    args = parser.parse_args(argv)

    opt = Opt()

    # 1. config.toml (lowest precedence)
    config_path = args.config_file_path or os.environ.get(
        "MEILI_CONFIG_FILE_PATH", "./config.toml"
    )
    if os.path.exists(config_path):
        import tomllib

        with open(config_path, "rb") as f:
            data = tomllib.load(f)
        for key, value in data.items():
            attr = key.replace("-", "_")
            if hasattr(opt, attr) and attr != "extra":
                setattr(opt, attr, value)
            else:
                opt.extra[key] = value

    # 2. MEILI_* env vars
    for env_key, attr in _ENV_MAP.items():
        value: Any = os.environ.get(env_key)
        if value is None:
            continue
        if attr in ("no_analytics", "experimental_enable_metrics"):
            value = value.lower() in ("1", "true", "yes")
        elif attr in ("schedule_snapshot", "max_indexing_threads"):
            try:
                value = int(value)
            except ValueError:
                continue
        setattr(opt, attr, value)

    # 3. CLI flags (highest precedence)
    for attr in (
        "db_path", "http_addr", "master_key", "env", "import_dump",
        "import_snapshot", "schedule_snapshot", "snapshot_dir", "dump_dir",
        "max_indexing_memory", "max_indexing_threads", "log_level",
    ):
        value = getattr(args, attr, None)
        if value is not None:
            setattr(opt, attr, value)
    if args.no_analytics is not None:
        opt.no_analytics = True
    if args.experimental_enable_metrics is not None:
        opt.experimental_enable_metrics = True
    if args.host or args.port:
        opt.http_addr = f"{args.host or opt.host}:{args.port or opt.port}"

    if opt.env == "production" and not opt.master_key:
        raise SystemExit(
            "error: In production mode, the environment variable"
            " MEILI_MASTER_KEY is mandatory"
        )
    return opt
