"""Environment-compatibility shims (protobuf vendoring for stateful v2)."""
