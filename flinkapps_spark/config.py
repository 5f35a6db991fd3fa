"""Config / parameter surface (SURVEY §2.9) — the engine's "API" parity
with the reference's properties-file + CLI-args loading.

The reference reads flinkApps.properties (keys: BOOTSTRAP_SERVERS,
LOC_KFKA_SRC/SNK, KFKA_CONS_GRP, SRC_FILE_PATH, sink paths, thresholds
SYMB/OPEN/HIGH/LOW/CLOSE/BET_FROM/BET_TO — reference
src/main/resources/flinkApps.properties:1-31) and CLI args via
ParameterTool (--topic_source --topic_sink --groupId --symb --high --low,
reference source/flinkStreamingInput.scala:39-50), failing fast with a
usage message when under-parameterized (:30-36).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field, fields


class UsageError(SystemExit):
    """Fail-fast on missing parameters, like the reference's usage print."""


@dataclass
class EngineConfig:
    # Kafka / streaming surface
    bootstrap_servers: str = "localhost:9092"
    topic_source: str = "loc-kfka-src"
    topic_sink: str = "loc-kfka-snk"
    group_id: str = "flnk-kfka"
    # file surface
    src_file_path: str = ""
    file_sink_path: str = ""
    hdfs_sink_path: str = ""
    # thresholds (reference flinkApps.properties:26-31)
    symb: str = "ABB"
    open: float = 100.0
    high: float = 50.0
    low: float = 10.0
    close: float = 200.0
    bet_from: int = 2010
    bet_to: int = 2011
    # jdbc surface
    jdbc_url: str = ""
    jdbc_table: str = ""
    jdbc_user: str = ""
    jdbc_password: str = ""

    # reference properties-file key → field mapping
    _PROP_KEYS = {
        "BOOTSTRAP_SERVERS": "bootstrap_servers",
        "LOC_KFKA_SRC": "topic_source",
        "LOC_KFKA_SNK": "topic_sink",
        "KFKA_CONS_GRP": "group_id",
        "SRC_FILE_PATH": "src_file_path",
        "LOC_FILE_SINK_PATH": "file_sink_path",
        "HDFS_FILE_SINK_PATH": "hdfs_sink_path",
        "SYMB": "symb",
        "OPEN": "open",
        "HIGH": "high",
        "LOW": "low",
        "CLOSE": "close",
        "BET_FROM": "bet_from",
        "BET_TO": "bet_to",
    }

    @classmethod
    def from_properties(cls, path: str) -> "EngineConfig":
        """Java-style .properties loader (k=v lines, # comments)."""
        raw: dict[str, str] = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith(("#", "!")):
                    continue
                if "=" in line:
                    k, v = line.split("=", 1)
                    raw[k.strip()] = v.strip()
        return cls.from_dict(
            {cls._PROP_KEYS[k]: v for k, v in raw.items()
             if k in cls._PROP_KEYS})

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        cfg = cls()
        ftypes = {f.name: f.type for f in fields(cls) if not f.name.startswith("_")}
        for k, v in d.items():
            if k not in ftypes:
                raise UsageError(f"unknown config key: {k}")
            cur = getattr(cfg, k)
            setattr(cfg, k, type(cur)(v))
        return cfg

    @classmethod
    def from_args(cls, argv: list[str], required: tuple[str, ...] = ()) -> "EngineConfig":
        """CLI surface: --topic_source --topic_sink --groupId --symb
        --open --high --low --close (reference flinkStreamingInput.scala:39-50).
        Missing required args → usage message + exit (fail-fast, :30-36).
        """
        p = argparse.ArgumentParser(prog="flinkapps-spark", add_help=False)
        p.add_argument("--topic_source")
        p.add_argument("--topic_sink")
        p.add_argument("--groupId", dest="group_id")
        p.add_argument("--symb")
        p.add_argument("--open", type=float)
        p.add_argument("--high", type=float)
        p.add_argument("--low", type=float)
        p.add_argument("--close", type=float)
        p.add_argument("--properties")
        ns, _ = p.parse_known_args(argv)
        base = (cls.from_properties(ns.properties)
                if ns.properties else cls())
        for k in ("topic_source", "topic_sink", "group_id", "symb",
                  "open", "high", "low", "close"):
            v = getattr(ns, k)
            if v is not None:
                setattr(base, k, v)
        missing = [r for r in required
                   if getattr(ns, r, None) is None]
        if missing:
            raise UsageError(
                "Usage: --topic_source <t> --topic_sink <t> --groupId <g> "
                f"--symb <s> [--open --high --low --close] ; missing: {missing}")
        return base
