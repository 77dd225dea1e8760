"""Sources & sinks: Lance-layout table adapter + deterministic synthetic corpus."""
