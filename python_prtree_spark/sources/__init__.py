"""Sources & sinks: persisted index tables (save/load), checkpoint +
lineage tables with partition-granular resume, and the deterministic
synthetic image+caption table generator."""
