from .ast_parser import parse_solidity_to_ast, prepare_code2vec_input
from .tokenizer import SolidityTokenizer, get_tokenizer
from .dataset import (
    SmartContractVulnerabilityDataset,
    custom_collate_fn,
    create_dataloaders,
    build_token_to_line,
    inspect_dataloader,
)
from .augmentation import SmartContractAugmenter
from .pattern_matcher import PatternMatcher

__all__ = [
    "parse_solidity_to_ast",
    "prepare_code2vec_input",
    "SolidityTokenizer",
    "get_tokenizer",
    "SmartContractVulnerabilityDataset",
    "custom_collate_fn",
    "create_dataloaders",
    "build_token_to_line",
    "inspect_dataloader",
    "SmartContractAugmenter",
    "PatternMatcher",
]
