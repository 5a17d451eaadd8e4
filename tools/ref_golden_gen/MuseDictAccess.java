// Generator-side accessor for MUSE.Dictionary's package-private maps
// (original harness code — lives in the reference's package only to read
// the insertion-order id assignments so goldens can be emitted under
// CONTENT keys (w, dim, word, word2) instead of ids).
package sfa.transformation;

public class MuseDictAccess {
    /** rows of (w, dim, word, word2, id) for every MuseWord in the dict. */
    public static int[][] entries(MUSE.Dictionary d) {
        int n = d.dict.size();
        int[][] out = new int[n][5];
        for (int i = 0; i < n; i++) {
            MUSE.MuseWord k = d.dict.keyAt(i);
            out[i] = new int[]{k.w, k.dim, k.word, k.word2, d.dict.indexGet(i)};
        }
        return out;
    }

    /** (old id, new id) pairs of the post-chi remap dictionary. */
    public static int[][] chiEntries(MUSE.Dictionary d) {
        return d.dictChi.entries();
    }
}
