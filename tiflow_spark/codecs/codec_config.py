"""Codec Config.Validate parity — the changefeed-create-time error matrix
of pkg/sink/codec/common/config.go:344-424.

The behaviors these options select are implemented and oracle-checked
elsewhere (codecs/avro.py handling modes + Confluent/Glue registries +
checksum, codecs/large_message.py); this module is the CREATE-TIME gate
the reference CLI applies before any event is encoded — a misconfigured
changefeed must error at create, not silently encode (the same principle
as large_message.adjust_and_validate, VERDICT r13 #3):

- enable-tidb-extension on a protocol other than canal-json/avro/debezium
  is a WARNING (ignored option), not an error (config.go:345-352)
- avro requires EXACTLY ONE of the Confluent or Glue schema registries
  (:354-369)
- avro-decimal-handling-mode must be 'precise' or 'string' (:371-378)
- avro-bigint-unsigned-handling-mode must be 'long' or 'string' (:380-387)
- enable-row-checksum (avro) requires enable-tidb-extension AND both
  handling modes = 'string' (:389-399)
- max-message-bytes and max-batch-size must be positive (:403-413)
- the nested large-message block runs AdjustAndValidate (:415-421)
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass

from tiflow_spark.codecs.large_message import (
    LargeMessageHandleConfig,
    adjust_and_validate,
)

DECIMAL_HANDLING_PRECISE = "precise"
DECIMAL_HANDLING_STRING = "string"
BIGINT_UNSIGNED_HANDLING_LONG = "long"
BIGINT_UNSIGNED_HANDLING_STRING = "string"

# protocols that honor enable-tidb-extension (config.go:346-347)
_TIDB_EXTENSION_PROTOCOLS = ("canal-json", "avro", "debezium")


@dataclass(frozen=True)
class CodecConfig:
    """The slice of common.Config the create-time validator reads
    (config.go:36-93; defaults :108-137)."""

    protocol: str = "open-protocol"
    enable_tidb_extension: bool = False
    max_message_bytes: int = 10 * 1024 * 1024  # config.DefaultMaxMessageBytes
    max_batch_size: int = 16  # defaultMaxBatchSize
    avro_confluent_schema_registry: str = ""
    avro_glue_schema_registry: str | None = None
    avro_decimal_handling_mode: str = DECIMAL_HANDLING_PRECISE
    avro_bigint_unsigned_handling_mode: str = BIGINT_UNSIGNED_HANDLING_LONG
    enable_row_checksum: bool = False
    large_message_handle: LargeMessageHandleConfig | None = None


def validate_codec_config(cfg: CodecConfig) -> CodecConfig:
    """Config.Validate parity (config.go:344-424). Raises ValueError with
    the reference's message shapes; returns the config with its nested
    large-message block adjusted (the Go method mutates in place)."""
    if cfg.enable_tidb_extension and cfg.protocol not in (
        _TIDB_EXTENSION_PROTOCOLS
    ):
        # the reference logs a warning and IGNORES the option — it does
        # not error (config.go:345-352)
        warnings.warn(
            "ignore invalid config, enable-tidb-extension only supports "
            "canal-json/avro/debezium protocol "
            f"(protocol={cfg.protocol!r})",
            stacklevel=2,
        )
    if cfg.protocol == "avro":
        has_confluent = bool(cfg.avro_confluent_schema_registry)
        has_glue = cfg.avro_glue_schema_registry is not None
        if has_confluent and has_glue:
            raise ValueError(
                'Avro protocol requires only one of "schema-registry" or '
                '"glue-schema-registry" to specify the schema registry'
            )
        if not has_confluent and not has_glue:
            raise ValueError(
                'Avro protocol requires parameter "schema-registry" or '
                '"glue-schema-registry" to specify the schema registry'
            )
        if cfg.avro_decimal_handling_mode not in (
            DECIMAL_HANDLING_PRECISE,
            DECIMAL_HANDLING_STRING,
        ):
            raise ValueError(
                'avro-decimal-handling-mode value could only be '
                '"string" or "precise"'
            )
        if cfg.avro_bigint_unsigned_handling_mode not in (
            BIGINT_UNSIGNED_HANDLING_LONG,
            BIGINT_UNSIGNED_HANDLING_STRING,
        ):
            raise ValueError(
                'avro-bigint-unsigned-handling-mode value could only be '
                '"long" or "string"'
            )
        if cfg.enable_row_checksum and not (
            cfg.enable_tidb_extension
            and cfg.avro_decimal_handling_mode == DECIMAL_HANDLING_STRING
            and cfg.avro_bigint_unsigned_handling_mode
            == BIGINT_UNSIGNED_HANDLING_STRING
        ):
            raise ValueError(
                "Avro protocol with row level checksum, should set "
                '"enable-tidb-extension" to "true", and set '
                '"avro-decimal-handling-mode" to "string" and '
                '"avro-bigint-unsigned-handling-mode" to "string"'
            )
    if cfg.max_message_bytes <= 0:
        raise ValueError(
            f"invalid max-message-bytes {cfg.max_message_bytes}"
        )
    if cfg.max_batch_size <= 0:
        raise ValueError(f"invalid max-batch-size {cfg.max_batch_size}")
    if cfg.large_message_handle is not None:
        from dataclasses import replace

        adjusted = adjust_and_validate(
            cfg.large_message_handle,
            cfg.protocol,
            enable_tidb_extension=cfg.enable_tidb_extension,
        )
        return replace(cfg, large_message_handle=adjusted)
    return cfg


def codec_config_from_params(
    params: dict[str, str], protocol: str
) -> CodecConfig:
    """Build a CodecConfig off sink-URI query params the way
    NewConfig + Apply do (config.go:139-263) — only the keys the
    validator reads; unknown keys are the URI layer's concern."""

    def _b(key: str) -> bool:
        return params.get(key) in ("true", "1", "yes")

    lm = None
    if (
        params.get("large-message-handle-option")
        or params.get("large-message-handle-compression")
        or params.get("claim-check-storage-uri")
        or params.get("claim-check-raw-value")
    ):
        lm = LargeMessageHandleConfig(
            large_message_handle_option=params.get(
                "large-message-handle-option", "none"
            ),
            large_message_handle_compression=params.get(
                "large-message-handle-compression", "none"
            ),
            claim_check_storage_uri=params.get("claim-check-storage-uri", ""),
            claim_check_raw_value=_b("claim-check-raw-value"),
        )
    return CodecConfig(
        protocol=protocol,
        enable_tidb_extension=_b("enable-tidb-extension"),
        max_message_bytes=int(
            params.get("max-message-bytes", str(10 * 1024 * 1024))
        ),
        max_batch_size=int(params.get("max-batch-size", "16")),
        avro_confluent_schema_registry=params.get("schema-registry", ""),
        avro_glue_schema_registry=params.get("glue-schema-registry"),
        avro_decimal_handling_mode=params.get(
            "avro-decimal-handling-mode", DECIMAL_HANDLING_PRECISE
        ),
        avro_bigint_unsigned_handling_mode=params.get(
            "avro-bigint-unsigned-handling-mode",
            BIGINT_UNSIGNED_HANDLING_LONG,
        ),
        enable_row_checksum=_b("enable-row-checksum"),
        large_message_handle=lm,
    )
