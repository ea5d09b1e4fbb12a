"""Example trainers/eval CLIs (reference ``src/brevitas_examples``)."""
