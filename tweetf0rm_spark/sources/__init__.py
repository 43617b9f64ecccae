"""Sources & sinks: snapshot store (Iceberg-or-emulated), seed lists."""
