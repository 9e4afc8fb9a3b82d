"""Host I/O stack: BGZF, BAM/BAI, FASTA/faidx, tabix — from scratch."""
