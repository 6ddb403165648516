// Differential-test driver for the REFERENCE ISR algebra
// (index/src/TermAND.cpp, TermOR.cpp, NotIndexStreamReader.cpp,
// IdentityISR.h) vs mithril_spark.query.isr / vecisr.
//
// Leaves are VectorISR mocks transcribing TermReader's cursor semantics
// exactly (TermReader.cpp:69-117 hasNext/moveNext/currentDocID throw,
// :148-200 forward-only seekToDocID) — the real TermReader is
// storage-coupled (mmap + dictionary), but TermAND/TermOR/NotISR operate
// on the abstract IndexStreamReader, so the *algebra* (zig-zag,
// min-of-heads, complement incl. the doc-0 and backward-seek rewind
// quirks) is exercised verbatim from the compiled reference objects.
// TermReader.cpp is linked only for the typeinfo TermAND's
// sortReadersByFrequency dynamic_cast needs; mock leaves are not
// TermReaders, so readers keep pointer order (== construction order under
// ascending allocation — asserted by the Python twin).
//
// stdin per case:
//   "C <doc_count> <ntok> <nops>\n"
//   "<tree tokens>\n"    prefix: A | O | N | I | L <n> <d1> ... <dn>
//   "<ops>\n"            ops: m (moveNext) | s<target> (seekToDocID)
// Response: one line per state — the initial state, then after each op:
//   "1 <currentDocID>" when hasNext, else "0 X"; "E" on any exception,
//   then the case ends. Terminated by "END\n".

#include <cstdint>
#include <cstdio>
#include <iostream>
#include <memory>
#include <sstream>
#include <cstdlib>
#include <stdexcept>
#include <string>
#include <vector>

#include "IdentityISR.h"
#include "NotIndexStreamReader.h"
#include "TermAND.h"
#include "TermOR.h"

// TermAND::sortReadersByFrequency breaks ties between non-TermReader
// children by RAW POINTER VALUE (TermAND.cpp:142 "a.get() < b.get()") —
// implementation-defined under malloc. The Python transcription documents
// the ascending-allocation model (construction order); a global bump-arena
// operator new makes the driver's allocation order monotonic so the
// differential tests that documented model deterministically.
static char* g_arena = nullptr;
static size_t g_arena_off = 0;
static constexpr size_t g_arena_cap = 256u << 20;

void* operator new(size_t n) {
    if (g_arena == nullptr)
        g_arena = static_cast<char*>(std::malloc(g_arena_cap));
    n = (n + 15) & ~size_t(15);
    if (g_arena_off + n > g_arena_cap)
        std::abort();
    void* p = g_arena + g_arena_off;
    g_arena_off += n;
    return p;
}

void operator delete(void*) noexcept {}
void operator delete(void*, size_t) noexcept {}

using namespace mithril;

class VectorISR : public IndexStreamReader {
public:
    explicit VectorISR(std::vector<data::docid_t> docs) : docs_(std::move(docs)) {}
    bool hasNext() const override { return !at_end_ && idx_ < docs_.size(); }
    void moveNext() override {
        if (!hasNext()) {
            at_end_ = true;
            return;
        }
        idx_++;
    }
    data::docid_t currentDocID() const override {
        if (!hasNext())
            throw std::runtime_error("No current posting");
        return docs_[idx_];
    }
    void seekToDocID(data::docid_t t) override {
        if (docs_.empty() || at_end_)
            return;
        if (idx_ < docs_.size() && docs_[idx_] >= t)
            return;
        if (t > docs_.back()) {
            idx_ = docs_.size();
            at_end_ = true;
            return;
        }
        while (idx_ < docs_.size() && docs_[idx_] < t)
            idx_++;
        if (idx_ >= docs_.size())
            at_end_ = true;
    }

private:
    std::vector<data::docid_t> docs_;
    size_t idx_{0};
    bool at_end_{false};
};

static std::unique_ptr<IndexStreamReader> build(std::istringstream& in, size_t doc_count) {
    std::string tok;
    if (!(in >> tok))
        throw std::runtime_error("bad tree");
    if (tok == "A" || tok == "O") {
        std::vector<std::unique_ptr<IndexStreamReader>> kids;
        kids.push_back(build(in, doc_count));
        kids.push_back(build(in, doc_count));
        if (tok == "A")
            return std::make_unique<TermAND>(std::move(kids));
        return std::make_unique<TermOR>(std::move(kids));
    }
    if (tok == "N")
        return std::make_unique<NotISR>(build(in, doc_count), doc_count);
    if (tok == "I")
        return std::make_unique<IdentityISR>();
    if (tok == "L") {
        size_t n;
        in >> n;
        std::vector<data::docid_t> docs(n);
        for (size_t i = 0; i < n; i++)
            in >> docs[i];
        return std::make_unique<VectorISR>(std::move(docs));
    }
    throw std::runtime_error("bad token");
}

static void state(const IndexStreamReader& isr) {
    if (isr.hasNext())
        std::cout << "1 " << isr.currentDocID() << "\n";
    else
        std::cout << "0 X\n";
}

int main() {
    std::string op;
    while (std::cin >> op && op == "C") {
        size_t doc_count, ntok, nops;
        std::cin >> doc_count >> ntok >> nops;
        std::cin.ignore(1);
        std::string tree_line, ops_line;
        std::getline(std::cin, tree_line);
        std::getline(std::cin, ops_line);
        try {
            std::istringstream tin(tree_line);
            auto isr = build(tin, doc_count);
            state(*isr);
            std::istringstream oin(ops_line);
            std::string o;
            while (oin >> o) {
                if (o == "m") {
                    isr->moveNext();
                } else if (o[0] == 's') {
                    isr->seekToDocID(
                        static_cast<data::docid_t>(std::stoul(o.substr(1))));
                } else {
                    throw std::runtime_error("bad op");
                }
                state(*isr);
            }
        } catch (const std::exception&) {
            std::cout << "E\n";
        }
        std::cout << "END\n" << std::flush;
    }
    return 0;
}
