# tools/ is importable so bench.py and tests can reuse the genome
# simulator (repeat_genome.py) and the accuracy harness directly.
