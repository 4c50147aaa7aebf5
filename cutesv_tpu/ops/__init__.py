"""Device kernel library (JAX/XLA; Pallas where XLA's ops fall short).

The reference's per-chromosome algorithms all reduce to
sort + adjacent-difference segmentation + segment reductions (SURVEY §7);
this package provides those primitives over dense int32 coordinate tensors:

    segments.py       boundary flags, segment ids, segment reductions
    indel_cluster.py  the DEL/INS cluster-structure kernel
    pair_cluster.py   the DUP/INV cluster-structure kernels (TRA stays
                      host-side: sequential count_coverage replay, tiny
                      volumes — see models/host.py::resolve_tra)
    sweep.py          interval cover counting (genotype read support)
    pallas_sweep.py   VMEM-resident Pallas variant of the cover counting
(the genotype-likelihood table gather lives in cutesv_tpu/genotype.py)
"""
