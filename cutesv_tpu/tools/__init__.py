"""Standalone post-processing and evaluation CLIs.

Counterparts of the reference's diploid_calling.py and src/benchmarks/*:
    vcfio            shared text-VCF reader (replaces pyvcf3)
    diploid_calling  haplotype-tag GT rewrite for assembly alignments
    vcf2bedpe        VCF -> BEDPE conversion
    eval_sim         simulation truth-set evaluation (TP/FN, genotype-aware)
"""
