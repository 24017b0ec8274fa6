from .newick import parse_newick, write_newick
from .vcf import read_vcf
from .pbio import load_mat_pb, save_mat_pb
