"""Sources & sinks: table schemas, Kafka configuration builders, and the
file-backed CDC message-log emulation used by tests and local runs."""
