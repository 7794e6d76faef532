// Native tokenizer/normalizer — the indexing hot path.
//
// Mirrors meilisearch_tpu/analysis/tokenizer.py (the charabia-equivalent
// Latin pipeline): segmentation on non-alphanumeric runs, soft/hard
// separator classification (hard separators insert a +4 position gap, the
// reference's tokenize_document.rs MAX_DISTANCE), Latin diacritic folding
// and lowercasing.
//
// Scope: ASCII + Latin-1 Supplement + Latin Extended-A. Any other script
// returns -1 and the caller falls back to the Python tokenizer, so the two
// implementations can never disagree on text the native path accepts.
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstring>

namespace {

constexpr int HARD_GAP = 4;

inline bool is_hard_separator(uint32_t cp) {
    switch (cp) {
        case '.': case ';': case ',': case '!': case '?':
        case '(': case ')': case '[': case ']': case '{': case '}':
        case '|':
            return true;
        default:
            return false;
    }
}

inline bool is_ascii_word(uint32_t cp) {
    return (cp >= '0' && cp <= '9') || (cp >= 'a' && cp <= 'z') ||
           (cp >= 'A' && cp <= 'Z');
}

// Fold one codepoint per the Python ground-truth normalizer.
// The table for U+0080..U+017F is GENERATED from
// meilisearch_tpu/analysis/tokenizer.py (normalize_word + separator
// classification) so the two implementations cannot diverge.
struct FoldEntry { int8_t len; char out[3]; };  // len: -1 fallback, -2 hard sep, 0 soft sep

static const FoldEntry kFoldTable[256] = {
    {0, {0,0,0}}, // U+0080 soft sep
    {0, {0,0,0}}, // U+0081 soft sep
    {0, {0,0,0}}, // U+0082 soft sep
    {0, {0,0,0}}, // U+0083 soft sep
    {0, {0,0,0}}, // U+0084 soft sep
    {0, {0,0,0}}, // U+0085 soft sep
    {0, {0,0,0}}, // U+0086 soft sep
    {0, {0,0,0}}, // U+0087 soft sep
    {0, {0,0,0}}, // U+0088 soft sep
    {0, {0,0,0}}, // U+0089 soft sep
    {0, {0,0,0}}, // U+008A soft sep
    {0, {0,0,0}}, // U+008B soft sep
    {0, {0,0,0}}, // U+008C soft sep
    {0, {0,0,0}}, // U+008D soft sep
    {0, {0,0,0}}, // U+008E soft sep
    {0, {0,0,0}}, // U+008F soft sep
    {0, {0,0,0}}, // U+0090 soft sep
    {0, {0,0,0}}, // U+0091 soft sep
    {0, {0,0,0}}, // U+0092 soft sep
    {0, {0,0,0}}, // U+0093 soft sep
    {0, {0,0,0}}, // U+0094 soft sep
    {0, {0,0,0}}, // U+0095 soft sep
    {0, {0,0,0}}, // U+0096 soft sep
    {0, {0,0,0}}, // U+0097 soft sep
    {0, {0,0,0}}, // U+0098 soft sep
    {0, {0,0,0}}, // U+0099 soft sep
    {0, {0,0,0}}, // U+009A soft sep
    {0, {0,0,0}}, // U+009B soft sep
    {0, {0,0,0}}, // U+009C soft sep
    {0, {0,0,0}}, // U+009D soft sep
    {0, {0,0,0}}, // U+009E soft sep
    {0, {0,0,0}}, // U+009F soft sep
    {0, {0,0,0}}, // U+00A0 soft sep
    {-2, {0,0,0}}, // U+00A1 hard sep
    {0, {0,0,0}}, // U+00A2 soft sep
    {0, {0,0,0}}, // U+00A3 soft sep
    {0, {0,0,0}}, // U+00A4 soft sep
    {0, {0,0,0}}, // U+00A5 soft sep
    {0, {0,0,0}}, // U+00A6 soft sep
    {0, {0,0,0}}, // U+00A7 soft sep
    {0, {0,0,0}}, // U+00A8 soft sep
    {0, {0,0,0}}, // U+00A9 soft sep
    {1, {'a',0,0}}, // U+00AA -> a
    {0, {0,0,0}}, // U+00AB soft sep
    {0, {0,0,0}}, // U+00AC soft sep
    {0, {0,0,0}}, // U+00AD soft sep
    {0, {0,0,0}}, // U+00AE soft sep
    {0, {0,0,0}}, // U+00AF soft sep
    {0, {0,0,0}}, // U+00B0 soft sep
    {0, {0,0,0}}, // U+00B1 soft sep
    {1, {'2',0,0}}, // U+00B2 -> 2
    {1, {'3',0,0}}, // U+00B3 -> 3
    {0, {0,0,0}}, // U+00B4 soft sep
    {-1, {0,0,0}}, // U+00B5 fallback
    {0, {0,0,0}}, // U+00B6 soft sep
    {0, {0,0,0}}, // U+00B7 soft sep
    {0, {0,0,0}}, // U+00B8 soft sep
    {1, {'1',0,0}}, // U+00B9 -> 1
    {1, {'o',0,0}}, // U+00BA -> o
    {0, {0,0,0}}, // U+00BB soft sep
    {-1, {0,0,0}}, // U+00BC fallback
    {-1, {0,0,0}}, // U+00BD fallback
    {-1, {0,0,0}}, // U+00BE fallback
    {-2, {0,0,0}}, // U+00BF hard sep
    {1, {'a',0,0}}, // U+00C0 -> a
    {1, {'a',0,0}}, // U+00C1 -> a
    {1, {'a',0,0}}, // U+00C2 -> a
    {1, {'a',0,0}}, // U+00C3 -> a
    {1, {'a',0,0}}, // U+00C4 -> a
    {1, {'a',0,0}}, // U+00C5 -> a
    {-1, {0,0,0}}, // U+00C6 fallback
    {1, {'c',0,0}}, // U+00C7 -> c
    {1, {'e',0,0}}, // U+00C8 -> e
    {1, {'e',0,0}}, // U+00C9 -> e
    {1, {'e',0,0}}, // U+00CA -> e
    {1, {'e',0,0}}, // U+00CB -> e
    {1, {'i',0,0}}, // U+00CC -> i
    {1, {'i',0,0}}, // U+00CD -> i
    {1, {'i',0,0}}, // U+00CE -> i
    {1, {'i',0,0}}, // U+00CF -> i
    {-1, {0,0,0}}, // U+00D0 fallback
    {1, {'n',0,0}}, // U+00D1 -> n
    {1, {'o',0,0}}, // U+00D2 -> o
    {1, {'o',0,0}}, // U+00D3 -> o
    {1, {'o',0,0}}, // U+00D4 -> o
    {1, {'o',0,0}}, // U+00D5 -> o
    {1, {'o',0,0}}, // U+00D6 -> o
    {0, {0,0,0}}, // U+00D7 soft sep
    {-1, {0,0,0}}, // U+00D8 fallback
    {1, {'u',0,0}}, // U+00D9 -> u
    {1, {'u',0,0}}, // U+00DA -> u
    {1, {'u',0,0}}, // U+00DB -> u
    {1, {'u',0,0}}, // U+00DC -> u
    {1, {'y',0,0}}, // U+00DD -> y
    {-1, {0,0,0}}, // U+00DE fallback
    {-1, {0,0,0}}, // U+00DF fallback
    {1, {'a',0,0}}, // U+00E0 -> a
    {1, {'a',0,0}}, // U+00E1 -> a
    {1, {'a',0,0}}, // U+00E2 -> a
    {1, {'a',0,0}}, // U+00E3 -> a
    {1, {'a',0,0}}, // U+00E4 -> a
    {1, {'a',0,0}}, // U+00E5 -> a
    {-1, {0,0,0}}, // U+00E6 fallback
    {1, {'c',0,0}}, // U+00E7 -> c
    {1, {'e',0,0}}, // U+00E8 -> e
    {1, {'e',0,0}}, // U+00E9 -> e
    {1, {'e',0,0}}, // U+00EA -> e
    {1, {'e',0,0}}, // U+00EB -> e
    {1, {'i',0,0}}, // U+00EC -> i
    {1, {'i',0,0}}, // U+00ED -> i
    {1, {'i',0,0}}, // U+00EE -> i
    {1, {'i',0,0}}, // U+00EF -> i
    {-1, {0,0,0}}, // U+00F0 fallback
    {1, {'n',0,0}}, // U+00F1 -> n
    {1, {'o',0,0}}, // U+00F2 -> o
    {1, {'o',0,0}}, // U+00F3 -> o
    {1, {'o',0,0}}, // U+00F4 -> o
    {1, {'o',0,0}}, // U+00F5 -> o
    {1, {'o',0,0}}, // U+00F6 -> o
    {0, {0,0,0}}, // U+00F7 soft sep
    {-1, {0,0,0}}, // U+00F8 fallback
    {1, {'u',0,0}}, // U+00F9 -> u
    {1, {'u',0,0}}, // U+00FA -> u
    {1, {'u',0,0}}, // U+00FB -> u
    {1, {'u',0,0}}, // U+00FC -> u
    {1, {'y',0,0}}, // U+00FD -> y
    {-1, {0,0,0}}, // U+00FE fallback
    {1, {'y',0,0}}, // U+00FF -> y
    {1, {'a',0,0}}, // U+0100 -> a
    {1, {'a',0,0}}, // U+0101 -> a
    {1, {'a',0,0}}, // U+0102 -> a
    {1, {'a',0,0}}, // U+0103 -> a
    {1, {'a',0,0}}, // U+0104 -> a
    {1, {'a',0,0}}, // U+0105 -> a
    {1, {'c',0,0}}, // U+0106 -> c
    {1, {'c',0,0}}, // U+0107 -> c
    {1, {'c',0,0}}, // U+0108 -> c
    {1, {'c',0,0}}, // U+0109 -> c
    {1, {'c',0,0}}, // U+010A -> c
    {1, {'c',0,0}}, // U+010B -> c
    {1, {'c',0,0}}, // U+010C -> c
    {1, {'c',0,0}}, // U+010D -> c
    {1, {'d',0,0}}, // U+010E -> d
    {1, {'d',0,0}}, // U+010F -> d
    {-1, {0,0,0}}, // U+0110 fallback
    {-1, {0,0,0}}, // U+0111 fallback
    {1, {'e',0,0}}, // U+0112 -> e
    {1, {'e',0,0}}, // U+0113 -> e
    {1, {'e',0,0}}, // U+0114 -> e
    {1, {'e',0,0}}, // U+0115 -> e
    {1, {'e',0,0}}, // U+0116 -> e
    {1, {'e',0,0}}, // U+0117 -> e
    {1, {'e',0,0}}, // U+0118 -> e
    {1, {'e',0,0}}, // U+0119 -> e
    {1, {'e',0,0}}, // U+011A -> e
    {1, {'e',0,0}}, // U+011B -> e
    {1, {'g',0,0}}, // U+011C -> g
    {1, {'g',0,0}}, // U+011D -> g
    {1, {'g',0,0}}, // U+011E -> g
    {1, {'g',0,0}}, // U+011F -> g
    {1, {'g',0,0}}, // U+0120 -> g
    {1, {'g',0,0}}, // U+0121 -> g
    {1, {'g',0,0}}, // U+0122 -> g
    {1, {'g',0,0}}, // U+0123 -> g
    {1, {'h',0,0}}, // U+0124 -> h
    {1, {'h',0,0}}, // U+0125 -> h
    {-1, {0,0,0}}, // U+0126 fallback
    {-1, {0,0,0}}, // U+0127 fallback
    {1, {'i',0,0}}, // U+0128 -> i
    {1, {'i',0,0}}, // U+0129 -> i
    {1, {'i',0,0}}, // U+012A -> i
    {1, {'i',0,0}}, // U+012B -> i
    {1, {'i',0,0}}, // U+012C -> i
    {1, {'i',0,0}}, // U+012D -> i
    {1, {'i',0,0}}, // U+012E -> i
    {1, {'i',0,0}}, // U+012F -> i
    {1, {'i',0,0}}, // U+0130 -> i
    {-1, {0,0,0}}, // U+0131 fallback
    {2, {'i','j',0}}, // U+0132 -> ij
    {2, {'i','j',0}}, // U+0133 -> ij
    {1, {'j',0,0}}, // U+0134 -> j
    {1, {'j',0,0}}, // U+0135 -> j
    {1, {'k',0,0}}, // U+0136 -> k
    {1, {'k',0,0}}, // U+0137 -> k
    {-1, {0,0,0}}, // U+0138 fallback
    {1, {'l',0,0}}, // U+0139 -> l
    {1, {'l',0,0}}, // U+013A -> l
    {1, {'l',0,0}}, // U+013B -> l
    {1, {'l',0,0}}, // U+013C -> l
    {1, {'l',0,0}}, // U+013D -> l
    {1, {'l',0,0}}, // U+013E -> l
    {-1, {0,0,0}}, // U+013F fallback
    {-1, {0,0,0}}, // U+0140 fallback
    {-1, {0,0,0}}, // U+0141 fallback
    {-1, {0,0,0}}, // U+0142 fallback
    {1, {'n',0,0}}, // U+0143 -> n
    {1, {'n',0,0}}, // U+0144 -> n
    {1, {'n',0,0}}, // U+0145 -> n
    {1, {'n',0,0}}, // U+0146 -> n
    {1, {'n',0,0}}, // U+0147 -> n
    {1, {'n',0,0}}, // U+0148 -> n
    {-1, {0,0,0}}, // U+0149 fallback
    {-1, {0,0,0}}, // U+014A fallback
    {-1, {0,0,0}}, // U+014B fallback
    {1, {'o',0,0}}, // U+014C -> o
    {1, {'o',0,0}}, // U+014D -> o
    {1, {'o',0,0}}, // U+014E -> o
    {1, {'o',0,0}}, // U+014F -> o
    {1, {'o',0,0}}, // U+0150 -> o
    {1, {'o',0,0}}, // U+0151 -> o
    {-1, {0,0,0}}, // U+0152 fallback
    {-1, {0,0,0}}, // U+0153 fallback
    {1, {'r',0,0}}, // U+0154 -> r
    {1, {'r',0,0}}, // U+0155 -> r
    {1, {'r',0,0}}, // U+0156 -> r
    {1, {'r',0,0}}, // U+0157 -> r
    {1, {'r',0,0}}, // U+0158 -> r
    {1, {'r',0,0}}, // U+0159 -> r
    {1, {'s',0,0}}, // U+015A -> s
    {1, {'s',0,0}}, // U+015B -> s
    {1, {'s',0,0}}, // U+015C -> s
    {1, {'s',0,0}}, // U+015D -> s
    {1, {'s',0,0}}, // U+015E -> s
    {1, {'s',0,0}}, // U+015F -> s
    {1, {'s',0,0}}, // U+0160 -> s
    {1, {'s',0,0}}, // U+0161 -> s
    {1, {'t',0,0}}, // U+0162 -> t
    {1, {'t',0,0}}, // U+0163 -> t
    {1, {'t',0,0}}, // U+0164 -> t
    {1, {'t',0,0}}, // U+0165 -> t
    {-1, {0,0,0}}, // U+0166 fallback
    {-1, {0,0,0}}, // U+0167 fallback
    {1, {'u',0,0}}, // U+0168 -> u
    {1, {'u',0,0}}, // U+0169 -> u
    {1, {'u',0,0}}, // U+016A -> u
    {1, {'u',0,0}}, // U+016B -> u
    {1, {'u',0,0}}, // U+016C -> u
    {1, {'u',0,0}}, // U+016D -> u
    {1, {'u',0,0}}, // U+016E -> u
    {1, {'u',0,0}}, // U+016F -> u
    {1, {'u',0,0}}, // U+0170 -> u
    {1, {'u',0,0}}, // U+0171 -> u
    {1, {'u',0,0}}, // U+0172 -> u
    {1, {'u',0,0}}, // U+0173 -> u
    {1, {'w',0,0}}, // U+0174 -> w
    {1, {'w',0,0}}, // U+0175 -> w
    {1, {'y',0,0}}, // U+0176 -> y
    {1, {'y',0,0}}, // U+0177 -> y
    {1, {'y',0,0}}, // U+0178 -> y
    {1, {'z',0,0}}, // U+0179 -> z
    {1, {'z',0,0}}, // U+017A -> z
    {1, {'z',0,0}}, // U+017B -> z
    {1, {'z',0,0}}, // U+017C -> z
    {1, {'z',0,0}}, // U+017D -> z
    {1, {'z',0,0}}, // U+017E -> z
    {1, {'s',0,0}}, // U+017F -> s
};

// Returns output byte count, 0 for soft separator, -2 for hard separator,
// or -1 when the codepoint needs the Python fallback.
int fold_codepoint(uint32_t cp, char out[4]) {
    if (cp < 0x80) {
        if (is_ascii_word(cp)) {
            out[0] = (cp >= 'A' && cp <= 'Z') ? char(cp + 32) : char(cp);
            return 1;
        }
        return is_hard_separator(cp) ? -2 : 0;
    }
    if (cp >= 0x80 && cp < 0x180) {
        const FoldEntry& e = kFoldTable[cp - 0x80];
        if (e.len > 0) {
            for (int i = 0; i < e.len; i++) out[i] = e.out[i];
        }
        return e.len;
    }
    // common punctuation beyond Latin Extended-A (all soft separators in the
    // Python pipeline except the ellipsis)
    switch (cp) {
        case 0x2018: case 0x2019: case 0x201C: case 0x201D:
        case 0x2013: case 0x2014:
            return 0;
        case 0x2026:
            return -2;
        default:
            return -1;  // unsupported script: Python fallback
    }
}

}  // namespace

extern "C" {

// Tokenize `text` (UTF-8, `len` bytes).
// Outputs per token: byte start/len of the RAW token (for stop-word checks),
// its position (with hard-separator gaps), and the normalized form appended
// to `norm_buf` with its length in `norm_lens`.
// Returns the token count, or -1 when the text needs the Python fallback,
// or -2 when an output buffer is too small.
int mstpu_tokenize(
    const char* text, int32_t len,
    int32_t* raw_starts, int32_t* raw_lens, int32_t* positions,
    int32_t* norm_lens, char* norm_buf, int32_t norm_buf_cap,
    int32_t max_tokens) {
    int n_tokens = 0;
    int norm_used = 0;
    int position = 0;
    // prev: 0 = none yet, 1 = word, 2 = soft separator, 3 = hard separator
    int prev = 0;

    int i = 0;
    while (i < len) {
        // decode one codepoint
        uint32_t cp;
        int cp_len;
        unsigned char b0 = (unsigned char)text[i];
        if (b0 < 0x80) {
            cp = b0;
            cp_len = 1;
        } else if ((b0 >> 5) == 0x6 && i + 1 < len) {
            cp = ((b0 & 0x1F) << 6) | ((unsigned char)text[i + 1] & 0x3F);
            cp_len = 2;
        } else if ((b0 >> 4) == 0xE && i + 2 < len) {
            cp = ((b0 & 0x0F) << 12) |
                 (((unsigned char)text[i + 1] & 0x3F) << 6) |
                 ((unsigned char)text[i + 2] & 0x3F);
            cp_len = 3;
        } else {
            return -1;  // 4-byte or invalid: fallback
        }

        char folded[4];
        int fl = fold_codepoint(cp, folded);
        if (fl == -1) return -1;

        if (fl > 0) {
            // start of a word: consume the whole word run
            if (n_tokens >= max_tokens) return -2;
            int raw_start = i;
            int norm_start = norm_used;
            while (true) {
                if (norm_used + fl > norm_buf_cap) return -2;
                for (int k = 0; k < fl; k++) norm_buf[norm_used++] = folded[k];
                i += cp_len;
                if (i >= len) break;
                // decode next
                b0 = (unsigned char)text[i];
                if (b0 < 0x80) {
                    cp = b0; cp_len = 1;
                } else if ((b0 >> 5) == 0x6 && i + 1 < len) {
                    cp = ((b0 & 0x1F) << 6) | ((unsigned char)text[i + 1] & 0x3F);
                    cp_len = 2;
                } else if ((b0 >> 4) == 0xE && i + 2 < len) {
                    cp = ((b0 & 0x0F) << 12) |
                         (((unsigned char)text[i + 1] & 0x3F) << 6) |
                         ((unsigned char)text[i + 2] & 0x3F);
                    cp_len = 3;
                } else {
                    return -1;
                }
                fl = fold_codepoint(cp, folded);
                if (fl == -1) return -1;
                if (fl <= 0) break;  // separator ends the word
            }
            // position accounting (tokenizer.py indexed_words)
            if (prev == 3) {
                position += HARD_GAP;
            } else if (prev != 0) {
                position += 1;
            }
            prev = 1;
            raw_starts[n_tokens] = raw_start;
            raw_lens[n_tokens] = i - raw_start;
            positions[n_tokens] = position;
            norm_lens[n_tokens] = norm_used - norm_start;
            n_tokens++;
        } else {
            // separator run: classify hard vs soft
            bool hard = false;
            while (i < len) {
                b0 = (unsigned char)text[i];
                if (b0 < 0x80) {
                    cp = b0; cp_len = 1;
                } else if ((b0 >> 5) == 0x6 && i + 1 < len) {
                    cp = ((b0 & 0x1F) << 6) | ((unsigned char)text[i + 1] & 0x3F);
                    cp_len = 2;
                } else if ((b0 >> 4) == 0xE && i + 2 < len) {
                    cp = ((b0 & 0x0F) << 12) |
                         (((unsigned char)text[i + 1] & 0x3F) << 6) |
                         ((unsigned char)text[i + 2] & 0x3F);
                    cp_len = 3;
                } else {
                    return -1;
                }
                fl = fold_codepoint(cp, folded);
                if (fl == -1) return -1;
                if (fl > 0) break;  // word begins
                if (fl == -2) hard = true;
                i += cp_len;
            }
            // leading separators are skipped (reference process_tokens
            // skip_while); afterwards a hard separator is sticky
            if (prev != 0) {
                if (hard) prev = 3;
                else if (prev != 3) prev = 2;
            }
        }
    }
    return n_tokens;
}

}  // extern "C"
