"""Table layer: schemas, synthetic world generation, icelite checkpoints."""
