from .nuc import (
    nuc_id_from_char,
    char_from_nuc_id,
    nt_from_nuc_id,
    nuc_id_from_nt_list,
    nt_list_from_nuc_id,
)
from .tree import Mutation, Node, Tree, MissingSample
