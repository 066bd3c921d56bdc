from bella_tpu.io.fastq import ReadSet, parse_fastq, parse_fofn, read_files

__all__ = ["ReadSet", "parse_fastq", "parse_fofn", "read_files"]
