"""No-op stand-in for protobuf>=5.27's runtime_version module.

The real module rejects gencode built by a newer protoc than the
runtime; this stub accepts it (see ../../README.md for why that is
acceptable in this TEST environment only)."""


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:
    return None
