// Native vocab trie for the partial-last-word feature.
//
// The reference builds a Python character trie over the whole tokenizer vocab
// (codefuse_example.py:132-172) and walks it per request; this is the same
// structure in C++ — O(vocab chars) build at startup, iterative DFS queries —
// exposed through a C ABI for ctypes.
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

struct Node {
  std::map<char, std::unique_ptr<Node>> children;
  int32_t token_id = -1;  // >= 0 iff a vocab token ends here
};

struct Trie {
  Node root;
};

}  // namespace

extern "C" {

void* ftcf_trie_new() { return new Trie(); }

void ftcf_trie_insert(void* handle, const char* token, int32_t id) {
  Node* node = &static_cast<Trie*>(handle)->root;
  for (const char* p = token; *p; ++p) {
    auto& child = node->children[*p];
    if (!child) child = std::make_unique<Node>();
    node = child.get();
  }
  node->token_id = id;
}

// Token ids of every vocab entry whose string extends `prefix` (including the
// prefix itself when it is a token). Returns the total count; writes at most
// `cap` ids into `out`.
int ftcf_trie_extensions(void* handle, const char* prefix, int32_t* out,
                         int cap) {
  Node* node = &static_cast<Trie*>(handle)->root;
  for (const char* p = prefix; *p; ++p) {
    auto it = node->children.find(*p);
    if (it == node->children.end()) return 0;
    node = it->second.get();
  }
  int count = 0;
  std::vector<Node*> stack{node};
  while (!stack.empty()) {
    Node* n = stack.back();
    stack.pop_back();
    if (n->token_id >= 0) {
      if (count < cap) out[count] = n->token_id;
      ++count;
    }
    for (auto& kv : n->children) stack.push_back(kv.second.get());
  }
  return count;
}

void ftcf_trie_free(void* handle) { delete static_cast<Trie*>(handle); }

}  // extern "C"
