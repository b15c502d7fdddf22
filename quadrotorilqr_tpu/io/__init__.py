"""Serialization: wire-compatible protobuf schemas + pytree converters.

Regenerate the *_pb2.py modules after editing the schemas with:
    cd quadrotorilqr_tpu/io && protoc --proto_path=protos --python_out=. protos/*.proto
then re-apply the package-relative import in ilqr_debug_pb2.py
(`from . import trajectory_pb2 ...`).
"""

from . import ilqr_debug_pb2, ilqr_options_pb2, trajectory_pb2
from .proto import (
    debug_from_proto,
    debug_to_proto,
    options_from_proto,
    options_to_proto,
    trajectory_from_proto,
    trajectory_to_proto,
)

__all__ = [
    "trajectory_pb2",
    "ilqr_options_pb2",
    "ilqr_debug_pb2",
    "trajectory_to_proto",
    "trajectory_from_proto",
    "options_to_proto",
    "options_from_proto",
    "debug_to_proto",
    "debug_from_proto",
]
