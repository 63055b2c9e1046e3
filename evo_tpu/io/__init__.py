from evo_tpu.io.fasta import read_fasta, write_fasta  # noqa: F401
